from pose2room_tpu.config.loader import CONFIG, read_to_dict, update_recursive, mount_external_config
from pose2room_tpu.config.dataset_config import DatasetConfig
