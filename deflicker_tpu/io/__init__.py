from .media import (
    video_to_frames, frames_to_video, read_image, write_image,
    list_frames, FlowCache, imresize,
)

__all__ = [
    "video_to_frames", "frames_to_video", "read_image", "write_image",
    "list_frames", "FlowCache", "imresize",
]
