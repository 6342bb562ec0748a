# A/B-run compatibility: the reference calls FigureCanvasAgg.tostring_rgb,
# removed in matplotlib >= 3.8 — restore it from tostring_argb.
try:
    from matplotlib.backends.backend_agg import FigureCanvasAgg

    if not hasattr(FigureCanvasAgg, "tostring_rgb"):
        def tostring_rgb(self):
            import numpy as np

            argb = np.frombuffer(self.tostring_argb(), dtype=np.uint8)
            return argb.reshape(-1, 4)[:, 1:].tobytes()

        FigureCanvasAgg.tostring_rgb = tostring_rgb
except Exception:
    pass
