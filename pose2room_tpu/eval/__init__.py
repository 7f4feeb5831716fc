from pose2room_tpu.eval.parse import parse_predictions, parse_groundtruths, assembly_pred_map_cls, assembly_gt_map_cls
from pose2room_tpu.eval.ap import APCalculator, eval_det, voc_ap
