from .lookup import match_query
from .align import MatchResult, align_results

__all__ = ["match_query", "MatchResult", "align_results"]
