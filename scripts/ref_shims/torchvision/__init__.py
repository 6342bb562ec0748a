# stub: the reference uses only transforms.ToTensor (in visualize_depth)
from . import transforms  # noqa: F401
