"""TPU-native monocular SLAM + incremental free-space-carving surface reconstruction.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
``atlas-jj/ORB-SLAM-free-space-carving`` (ORB-SLAM2 + CARV).  The compute path is
batched array computation on TPU (feature extraction, Hamming matching, RANSAC
solver families, Schur-complement bundle adjustment, ray-parallel free-space
carving); the runtime around it is a functional-core pipeline exchanging
immutable map snapshots and an event journal (the generalization of the
reference's CARV "transcript", cf. reference src/Modeler/SFMTranscript.cpp).

Layer map (mirrors SURVEY.md section 1, re-architected TPU-first):

- ``utils``    : Lie groups (SE3/Sim3), camera model, datasets, trajectory IO,
                 ATE evaluation, event journal.
- ``ops``      : stateless jittable kernels — pyramid/FAST/ORB frontend,
                 Hamming matchers, RANSAC families (H/F/EPnP/Horn), triangulation,
                 pose optimization, Schur BA, Sim3 pose graph, carving, meshing.
- ``models``   : stateful pipeline stages — Frame/KeyFrame/MapState containers,
                 Tracking, LocalMapping, LoopClosing, Carver (Modeler), System.
- ``parallel`` : multi-chip sharding — mesh construction, keyframe-sharded BA,
                 map-block-sharded carving via shard_map + collectives.
- ``runtime``  : host-side asynchronous pipeline scheduler + native (C++) helpers.
- ``apps``     : CLI drivers mirroring the reference Examples/ binaries.
"""

__version__ = "0.1.0"

from orb_slam_free_space_carving_tpu.config import (  # noqa: F401
    CameraConfig,
    ORBConfig,
    MatcherConfig,
    TrackingConfig,
    MappingConfig,
    LoopConfig,
    OptimizerConfig,
    CarvingConfig,
    CapacityConfig,
    SystemConfig,
    load_settings,
)
