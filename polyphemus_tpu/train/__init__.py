from .losses import compute_losses  # noqa: F401
from .metrics import compute_accuracies  # noqa: F401
from .schedules import beta_schedule, lr_schedule  # noqa: F401
