# stub: used only by the reference's never-called SDF->PLY mesh export
class PlyData:  # pragma: no cover
    def __init__(self, *a, **k):
        raise RuntimeError("plyfile stub")


class PlyElement:  # pragma: no cover
    @staticmethod
    def describe(*a, **k):
        raise RuntimeError("plyfile stub")
