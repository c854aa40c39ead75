from . import losses, lr_schedule, pipeline, train_loop  # noqa: F401
