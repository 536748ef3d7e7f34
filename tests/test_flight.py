import numpy as np
from pyspark.sql import functions as F

from tabata_spark.operators.flight import cruise_summary, flight_summary, with_cruise_flag


def _pandas_cruise_flag(ref):
    mx = ref["ALT[m]"].max()
    return (ref["ALT[m]"] > mx - 2000) & (ref["Vz[m/s]"].abs() < 1)


def test_cruise_flag_matches_pandas(sset, flights):
    df = with_cruise_flag(sset.df)
    name = sset.records[0]
    got = (
        df.filter(F.col("record_id") == name).orderBy("seq").select("CR").toPandas()["CR"]
    )
    want = _pandas_cruise_flag(flights[name])
    np.testing.assert_array_equal(got.to_numpy(), want.to_numpy())


def test_flight_summary_matches_pandas(sset, flights):
    out = {r["record_id"]: r for r in flight_summary(sset.df).collect()}
    for name, ref in flights.items():
        r = out[name]
        assert abs(r["alt_max"] - ref["ALT[m]"].max()) < 1e-9
        assert abs(r["tisa_min"] - ref["Tisa[K]"].min()) < 1e-9
        assert abs(r["tas_mean"] - ref["TAS[m/s]"].mean()) < 1e-9
        hours = (ref.index[-1] - ref.index[0]).total_seconds() / 3600
        assert abs(r["duration_h"] - hours) < 1e-9
        conso = (ref["Masse[kg]"].iloc[0] - ref["Masse[kg]"].iloc[-1]) / hours
        assert abs(r["conso_kg_h"] - conso) < 1e-6
        assert r["conso_kg_h"] > 0  # fuel burn positive (mass monotone down)


def test_cruise_summary_runs(sset):
    out = cruise_summary(sset.df).collect()
    # every record has some cruise rows (even the low-cruise one: flag is relative to its own max)
    assert len(out) == len(sset.records)
