"""Multi-chip sharding: mesh construction + sharded BA / carving.

The reference is single-process multithreaded (SURVEY.md section 2.4); the TPU
framework adds the distributed backend the BASELINE targets require:
keyframe/observation-sharded bundle adjustment and ray-sharded carving over a
``jax.sharding.Mesh``, with XLA inserting the ``psum``-style collectives from
sharding annotations (the scaling-book recipe).
"""
