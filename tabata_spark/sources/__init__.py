from tabata_spark.sources.generator import make_flight_records

__all__ = ["make_flight_records"]
