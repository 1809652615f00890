from .dice import (  # noqa: F401
    soft_dice_loss,
    dice_ce_loss,
    region_dice,
    labels_to_regions,
    regions_to_labels,
)
