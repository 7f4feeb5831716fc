from pose2room_tpu.eval.parse import (
    parse_predictions,
    parse_predictions_device,
    parse_groundtruths,
    parse_groundtruths_device,
    assembly_pred_map_cls,
    assembly_gt_map_cls,
)
from pose2room_tpu.eval.ap import APCalculator, eval_det, voc_ap
