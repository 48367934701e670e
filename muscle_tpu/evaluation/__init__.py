from muscle_tpu.evaluation.miou import (
    confusion_matrix,
    iou_from_confusion,
    evaluate_folder,
    threshold_sweep,
    VOC_CATEGORIES,
)
