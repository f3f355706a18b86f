from .matcher import MatchParams, match_graph, match_pair

__all__ = ["MatchParams", "match_graph", "match_pair"]
