from .dtw import dtw  # noqa: F401
from .summary import SummaryWriter  # noqa: F401
