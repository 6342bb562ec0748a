# stub package: the reference imports skimage.measure at module scope but
# only uses it in the (never-called) mesh-export path.
