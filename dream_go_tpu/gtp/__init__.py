from .engine import GtpEngine  # noqa: F401
from .server import run_server  # noqa: F401
