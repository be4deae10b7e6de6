from .digest import cube_digest

__all__ = ["cube_digest"]
