from .media import (
    video_to_frames, frames_to_video, read_image, write_image,
    list_frames, FlowCache, imresize,
)
from .flow_io import (flow_to_image, read_flo, read_kitti_flow, write_flo,
                      write_kitti_flow)

__all__ = [
    "video_to_frames", "frames_to_video", "read_image", "write_image",
    "list_frames", "FlowCache", "imresize",
    "flow_to_image", "read_flo", "read_kitti_flow", "write_flo",
    "write_kitti_flow",
]
