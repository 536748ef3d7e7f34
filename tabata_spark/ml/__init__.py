from tabata_spark.ml.selector import Selector
from tabata_spark.ml.tube import Tube

__all__ = ["Selector", "Tube"]
