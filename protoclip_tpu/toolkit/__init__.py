"""Deployment toolkit — the TPU-native counterpart of the reference's
``proto-clip-toolkit`` pip package (SURVEY.md §2 L5): inference classifier,
OOD evaluation, t-SNE visualization, robot-perception geometry, and gated
ASR/POS/ROS integrations."""

from protoclip_tpu.toolkit.classifier import ProtoClipClassifier
from protoclip_tpu.toolkit.ood import test_ood_performance

__all__ = ["ProtoClipClassifier", "test_ood_performance"]
