from .losses import (
    cross_entropy_loss,
    label_smoothing_cross_entropy,
    segmentation_loss,
    soft_target_cross_entropy,
)
from .schedules import warmup_cosine_schedule, warmup_poly_schedule
from .optim import make_optimizer
from .metrics import (
    StreamingIoU,
    intersect_and_union,
    miou_from_totals,
    topk_accuracy,
)
