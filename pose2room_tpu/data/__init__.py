from pose2room_tpu.data.dataset import P2RNetDataset, load_sample, augment_sample
from pose2room_tpu.data.loader import DataLoader
from pose2room_tpu.data.synth import write_synthetic_dataset
