from boxtree_tpu import config  # noqa: F401
from boxtree_tpu.geometry.area_query import (
    AreaQueryBuilder,
    AreaQueryResult,
    LeavesToBallsLookup,
    LeavesToBallsLookupBuilder,
    PeerListFinder,
    PeerListLookup,
    SpaceInvaderQueryBuilder,
)

__all__ = [
    "AreaQueryBuilder",
    "AreaQueryResult",
    "LeavesToBallsLookup",
    "LeavesToBallsLookupBuilder",
    "PeerListFinder",
    "PeerListLookup",
    "SpaceInvaderQueryBuilder",
]
