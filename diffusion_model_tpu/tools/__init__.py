from .image_tools import (
    images_to_video,
    images_to_video_two_dirs_concat_cols,
    list_images,
    natural_key,
    show_image_tiles,
)

__all__ = [
    "images_to_video",
    "images_to_video_two_dirs_concat_cols",
    "list_images",
    "natural_key",
    "show_image_tiles",
]
