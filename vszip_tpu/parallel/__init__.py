from .mesh import frames_mesh, shard_clip, replicate_clip

__all__ = ["frames_mesh", "shard_clip", "replicate_clip"]
