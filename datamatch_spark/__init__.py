"""datamatch_spark — a PySpark-native record-linkage / deduplication
engine with the query surface of pckhoi/datamatch, rebuilt from scratch
on the DataFrame API (blocking = salted equi-joins, scoring = Column
expressions + Arrow pandas UDFs, clustering = large-star/small-star CC
+ per-component clique split).

Public API mirrors /root/reference/datamatch/__init__.py:1-18.
"""

from .filters import BaseFilter, ColumnFilter, DissimilarFilter, NonOverlappingFilter
from .indices import (
    BaseIndex,
    ColumnsIndex,
    GeoGridIndex,
    MultiIndex,
    NoopIndex,
    PhoneticIndex,
    QGramIndex,
    SortedNeighborhoodIndex,
    SuffixArrayIndex,
)
from .matchers import ThresholdMatcher
from .pairing import PairingConfig
from .scorers import (
    AbsoluteScorer,
    AlterScorer,
    BaseScorer,
    FuncScorer,
    MaxScorer,
    MinScorer,
    RefuseToScoreException,
    SimSumScorer,
)
from .session import get_spark
from .survivorship import golden_records
from .similarities import (
    AbsoluteNumericalSimilarity,
    DateSimilarity,
    GeoSimilarity,
    JaroWinklerSimilarity,
    MongeElkanSimilarity,
    RelativeNumericalSimilarity,
    StringSimilarity,
    TokenSetSimilarity,
)
from .variators import Swap, Variator

__all__ = [
    "NoopIndex",
    "ColumnsIndex",
    "MultiIndex",
    "PhoneticIndex",
    "QGramIndex",
    "SuffixArrayIndex",
    "SortedNeighborhoodIndex",
    "GeoGridIndex",
    "BaseIndex",
    "JaroWinklerSimilarity",
    "MongeElkanSimilarity",
    "TokenSetSimilarity",
    "GeoSimilarity",
    "StringSimilarity",
    "DateSimilarity",
    "AbsoluteNumericalSimilarity",
    "RelativeNumericalSimilarity",
    "ThresholdMatcher",
    "Variator",
    "Swap",
    "BaseFilter",
    "DissimilarFilter",
    "NonOverlappingFilter",
    "ColumnFilter",
    "BaseScorer",
    "SimSumScorer",
    "AbsoluteScorer",
    "MinScorer",
    "MaxScorer",
    "AlterScorer",
    "FuncScorer",
    "RefuseToScoreException",
    "PairingConfig",
    "get_spark",
    "golden_records",
]

__version__ = "0.1.0"
