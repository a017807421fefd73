from .loss import DetectionLoss, LossHyp  # noqa: F401
