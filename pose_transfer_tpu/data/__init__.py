from .annotations import (  # noqa: F401
    load_annotations,
    load_keypoints,
    project_keypoints,
)
from .pairs import (  # noqa: F401
    make_pair_nonvid,
    make_pairs,
    make_pairs_iterative,
    make_pairs_restricted,
    write_pair_files,
)
from .dataset import PoseTransferDataset  # noqa: F401
from .loader import BatchStream, DevicePrefetcher, sample_stream  # noqa: F401
from . import device, synthetic  # noqa: F401
