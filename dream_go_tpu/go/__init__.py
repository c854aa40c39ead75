from .engine import (  # noqa: F401
    BLACK,
    EMPTY,
    N,
    NN,
    PASS,
    WHITE,
    GoState,
    chain_liberties,
    legal_mask,
    new_state,
    step,
)
