from pose2room_tpu.models.p2rnet import P2RNet, P2RNetConfig
from pose2room_tpu.models.loss import detection_loss
