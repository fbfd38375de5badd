"""Multi-chip scale-out: device meshes, sharding rules, pjit train/infer steps."""
