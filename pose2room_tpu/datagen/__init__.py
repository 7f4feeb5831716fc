from pose2room_tpu.datagen.samples import process_recording, generate_samples
from pose2room_tpu.datagen.splits import generate_splits, compute_avg_prior
