from .records import Played, game_result_sgf  # noqa: F401
from .policy import PolicyPlayer, policy_self_play  # noqa: F401
