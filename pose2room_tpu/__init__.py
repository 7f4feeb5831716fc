"""pose2room_tpu — a TPU-native (JAX/XLA/Pallas) framework with the
capabilities of Pose2Room (P2RNet, ECCV 2022).

Predicts oriented 3D bounding boxes of room objects from a human pose
trajectory alone.  The compute path is jit-compiled JAX with Pallas kernels
for the point-sampling hot ops; distribution is expressed with
``jax.sharding`` over a device mesh (data-parallel by default).

Public surface mirrors the reference repo (see SURVEY.md):
``main.py --config <yaml> --mode {train,test,demo}``.
"""

__version__ = "0.1.0"
