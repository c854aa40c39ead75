from . import choose as _choose_mod  # noqa: F401
from . import predictor  # noqa: F401
from .choose import choose_weights  # noqa: F401
