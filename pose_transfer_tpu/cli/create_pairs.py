"""Pair-CSV generation CLI — rebuild of src_deformable/utils/create_pairs.py
(__main__, lines 105-128). Uses the same flags as the main driver.

Run: ``python -m pose_transfer_tpu.cli.create_pairs --dataset fasion
--pose_dim 18 --data_Dir <dir>``
"""

from __future__ import annotations

from ..data.pairs import write_pair_files
from .opts import Opts


def main(argv=None):
    p = Opts()
    p.init()
    p.parser.add_argument("--write_iterative", default=0, type=int,
                          help="also write the seqN iterative pair files "
                               "(create_pairs.py:45-77; pose_dim 16 only)")
    opt = Opts.derive(p.parser.parse_args(argv))
    write_pair_files(opt)


if __name__ == "__main__":
    main()
