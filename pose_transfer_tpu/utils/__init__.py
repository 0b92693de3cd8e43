from .visualize import (  # noqa: F401
    display,
    display_stacked,
    draw_pose_from_cords,
    draw_pose_from_map,
    make_grid,
    save_image,
)
from .summary import count_params, summarize  # noqa: F401
from .misc import draw_legend, mean_inputation, produce_ma_mask  # noqa: F401
