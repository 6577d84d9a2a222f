from .image_read import image_read

__all__ = ["image_read"]
