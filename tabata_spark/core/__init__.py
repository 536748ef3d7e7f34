from tabata_spark.core.naming import byunits, get_colname, nameunit
from tabata_spark.core.signalset import SignalSet

__all__ = ["SignalSet", "byunits", "get_colname", "nameunit"]
