from .store import FingerprintIndex, build_index, merge_indices, merge_into
from .catalog import SongCatalog
from .search import lexi_lower_bound, lexi_upper_bound

__all__ = [
    "FingerprintIndex",
    "build_index",
    "merge_indices",
    "merge_into",
    "SongCatalog",
    "lexi_lower_bound",
    "lexi_upper_bound",
]
