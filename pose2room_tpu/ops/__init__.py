from pose2room_tpu.ops.nn_distance import nn_distance, huber_loss
from pose2room_tpu.ops.sampling import furthest_point_sample, ball_query, group_points, gather_points
from pose2room_tpu.ops.boxes import (
    head2rot,
    rot2head,
    box_corners_from_params,
    get_3d_box,
    corners2params,
    box3d_iou_aabb,
    box3d_iou_oriented,
    points_in_obb,
)
from pose2room_tpu.ops.nms import nms_axis_aligned, nms_2d_faster, nms_3d_faster, nms_3d_faster_samecls
from pose2room_tpu.ops.interpolate import three_nn, three_interpolate, interpolate_features
