from .video import VideoReader, VideoWriter, open_camera  # noqa: F401
from .thumbnail import extract_thumbnail  # noqa: F401
from .datfiles import read_dat_dir  # noqa: F401
from .subsample import subsample_video  # noqa: F401
from .synthetic import moving_square_clip, write_clip  # noqa: F401
