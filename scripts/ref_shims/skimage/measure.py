def marching_cubes(*args, **kwargs):  # pragma: no cover
    raise RuntimeError("skimage stub: marching_cubes unavailable in A/B env")
