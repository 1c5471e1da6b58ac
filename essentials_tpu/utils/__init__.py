"""Utilities: compare, print, timer, stats (MTEPS), filepath helpers.

Reference parity: include/gunrock/util/ (compare.hxx, print.hxx, timer.hxx,
info.hxx — the stats collector the reference left as a dead stub is
implemented for real here).
"""

from essentials_tpu.utils.compare import compare
from essentials_tpu.utils.printing import print_head
from essentials_tpu.utils.timer import Timer
from essentials_tpu.utils.stats import RunStats, collect_stats

__all__ = ["compare", "print_head", "Timer", "RunStats", "collect_stats"]
