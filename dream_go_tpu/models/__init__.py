from .tower import Tower, TowerOutput  # noqa: F401
from . import params  # noqa: F401
