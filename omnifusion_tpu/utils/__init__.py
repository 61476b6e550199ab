from omnifusion_tpu.utils.colorize import colorize
from omnifusion_tpu.utils.iou import confusion_matrix, per_class_iou, evaluate_iou
from omnifusion_tpu.utils import ply

__all__ = ["colorize", "confusion_matrix", "per_class_iou", "evaluate_iou", "ply"]
