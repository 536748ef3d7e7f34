import numpy as np
import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------- compat


def test_opset_facade_roundtrip(tmp_path, spark, flights):
    from tabata_spark.compat import Opset

    store = str(tmp_path / "opset_store")
    ds = Opset(store, spark=spark)
    assert len(ds) == 0
    names = sorted(flights)[:3]
    for n in names:
        ds.put(flights[n], record=n)
    assert len(ds) == 3
    assert ds.records == names  # alphabetical
    assert ds.current_record() == names[-1]  # cursor follows put
    pdf = ds[0]
    assert pdf.index.name == names[0]
    assert list(pdf.columns) == list(flights[names[0]].columns)
    # negative indexing
    assert ds[-1].index.name == names[-1]
    # iterator restores cursor
    ds.rewind(1)
    _ = [df.shape for df in ds]
    assert ds.sigpos == 1
    # substring column resolution on the facade
    from tabata_spark.compat import get_colname

    assert get_colname(list(pdf.columns), "ALT") == "ALT[m]"


def test_opset_clean(tmp_path, spark, flights):
    from tabata_spark.compat import Opset

    store = str(tmp_path / "opset_store2")
    ds = Opset(store, spark=spark)
    ds.put(flights[sorted(flights)[0]], record="rec_a")
    assert len(ds) == 1
    ds.clean()
    assert len(ds) == 0


def test_compat_highlight(tmp_path, spark, flights):
    from tabata_spark.compat import Opset, highlight
    from tabata_spark.operators.flight import with_cruise_flag
    from tabata_spark.core.signalset import SignalSet

    store = str(tmp_path / "hl_origin")
    name = sorted(flights)[0]
    ds = Opset(store, spark=spark)
    ds.put(flights[name], record=name)
    # extract = cruise rows written to a second store
    flagged = with_cruise_flag(ds.sset.df)
    extract_path = str(tmp_path / "hl_extract")
    SignalSet(flagged.filter(F.col("CR"))).save(extract_path)
    ext = Opset(extract_path, spark=spark)
    out = highlight(ds, ext)
    assert out.phase == "INTERVAL"
    pdf = out[0]
    assert pdf["INTERVAL"].sum() == len(ext[0])  # flags = extract rows
    assert len(pdf) == len(ds[0])


def test_compat_opset_plot_and_browse(tmp_path, spark, flights):
    from tabata_spark.compat import Opset
    from tabata_spark.plots import FigureSpec

    store = str(tmp_path / "plot_store")
    ds = Opset(store, spark=spark)
    names = sorted(flights)[:2]
    for n in names:
        ds.put(flights[n], record=n)
    spec = ds.plot(pos=0, name="ALT")
    assert isinstance(spec, FigureSpec)
    assert spec.traces[0].name == "value"
    assert spec.yaxis_title == "m"
    assert ds.sigpos == 0 and ds.colname == "ALT[m]"
    with pytest.raises(NotImplementedError):
        ds.browse()


def test_compat_selector_storename(tmp_path, spark, sset, flights):
    """Selector(storename): position-keyed labels translate to the
    engine's name-keyed dict, fit/predict work end-to-end."""
    from pyspark.sql import functions as F

    from tabata_spark.compat import Selector
    from tabata_spark.operators.flight import with_cruise_flag

    store = str(tmp_path / "sel_store")
    sset.save(store)
    sel = Selector(store, spark=spark)
    assert sel.records == sset.records
    sel.variables = {"ALT[m]"}
    truth = {
        r["record_id"]: r["i"]
        for r in with_cruise_flag(sset.df)
        .filter(F.col("CR"))
        .groupBy("record_id")
        .agg(F.min("seq").alias("i"))
        .collect()
    }
    for i in range(3):
        sel.selected[i] = int(truth[sel.records[i]])
    # position keys translated to names for the engine
    assert sel._engine.selected == {
        sel.records[i]: int(truth[sel.records[i]]) for i in range(3)
    }
    assert sel.selected == {i: int(truth[sel.records[i]]) for i in range(3)}
    assert sel.viewed == {0, 1, 2}
    sel.feature_params = dict(
        range_width=range(10, 51, 20), range_sigma=[5, 15], max_order=2
    )
    sel.learn_params = dict(
        retry_number=3, retry_percentile=80, samples_percent=0.05,
        min_samples_split=0.05,
    )
    sel.predict_params = dict(filter_width=30)
    computed = sel.fit().predict()
    assert set(computed) == set(range(len(sset.records)))  # position-keyed
    assert "tree" in sel.describe().lower() or len(sel.idcodes) > 0
    # belief curve for the current record
    p = sel.belief(pos=0)
    assert len(p) == len(sset.to_pandas_record(sset.records[0]))
    assert abs(p.sum() - 1.0) < 1e-6 or p.sum() == 0.0  # normalized
    # re-target the trained detector at a second store (model moves,
    # labels don't)
    store2 = str(tmp_path / "sel_store2")
    sset.save(store2)
    sel2 = sel.load(store2)
    assert sel2._engine._model is sel._engine._model
    assert sel2.selected == {}
    assert set(sel2.predict()) == set(range(len(sset.records)))
    # clear_selection wipes labels and observations
    sel.clear_selection()
    assert sel.selected == {} and sel.viewed == set() and sel.variables == set()


def test_compat_selector_labeling_recorder(tmp_path, spark, sset):
    """The programmatic labeling recorder replays the reference's
    ipywidgets state transitions (instants.py:692-1058): a recorder
    session `mark_viewed(pos); label(pos, seq)` must produce the SAME
    fit inputs — engine-keyed selected, variables, viewed — as the
    dict-assignment style of instants_doc cell 14 (labels/viewed/
    variables assigned wholesale), which the reference documents as
    the non-interactive path. Cell 14's labels are scaled into the
    6-record/600-row fixture (pos < 6, seq // 10)."""
    from tabata_spark.compat import Selector

    # instants_doc cell 14, scaled: {0:1960, 1:1821, 3:1732, 4:1600,
    # 5:1391, ...} -> positions < 6, seq // 10
    labels = {0: 196, 1: 182, 3: 173, 4: 160, 5: 139}

    store = str(tmp_path / "rec_store")
    sset.save(store)

    # reference style: wholesale dict assignment (cell 14)
    ref = Selector(store, spark=spark)
    ref.selected = dict(labels)
    ref.viewed = set(labels)
    ref.variables = {"ALT[m]"}

    # recorder style: slider-navigate + click per label
    rec = Selector(store, spark=spark)
    for pos, seq in labels.items():
        rec.mark_viewed(pos, name="ALT")  # slider transition
        rec.label(pos, seq)  # click transition (adds colname to variables)

    assert rec._engine.selected == ref._engine.selected
    assert rec.variables == ref.variables == {"ALT[m]"}
    assert rec.viewed == set(labels)
    assert rec.selected == labels
    # cursor follows the last navigation, as the widget loop's does
    assert rec.sigpos == 5 and rec.colname == "ALT[m]"

    # a viewed-but-unlabeled record joins viewed only
    rec.mark_viewed(2)
    assert rec.viewed == set(labels) | {2}
    assert 2 not in rec.selected

    # the recorder's labels train end-to-end exactly like cell 14's
    rec.feature_params = dict(
        range_width=range(10, 51, 20), range_sigma=[5, 15], max_order=2
    )
    rec.learn_params = dict(
        retry_number=3, retry_percentile=80, samples_percent=0.05,
        min_samples_split=0.05,
    )
    computed = rec.fit().predict()
    assert set(computed) == set(range(len(sset.records)))


def test_compat_tube_storename(tmp_path, spark, sset):
    """Tube(storename): cursor estimate() returns per-record bound
    arrays; scores() is a pandas frame indexed by record."""
    from tabata_spark.compat import Tube

    store = str(tmp_path / "tube_store")
    sset.save(store)
    tube = Tube(store, spark=spark)
    tube.variables = {"ALT[m]"}
    tube.factors = {"ALT[m]", "Tisa[K]", "TAS[m/s]"}
    tube.learn_params = dict(
        retry_number=3, keep_best_number=2, samples_percent=0.05, max_features=3
    )
    tube.fit()
    z, zmin, zmax = tube.rewind(1).estimate("ALT")
    n = len(sset.to_pandas_record(sset.records[1]))
    assert len(z) == n
    assert (zmin <= zmax).all()
    scr = tube.scores()
    assert list(scr.index) == sset.records
    assert "score_ALT[m]" in scr.columns
    loc = tube.rewind(2).local_scores()
    assert list(loc.index) == [sset.records[2]]
    assert loc["N"].iloc[0] == scr["N"].loc[sset.records[2]]
    assert (
        loc["score_ALT[m]"].iloc[0] == scr["score_ALT[m]"].loc[sset.records[2]]
    )


# ---------------------------------------------------------------- PCA


def test_pca_project(sset):
    from tabata_spark.ml.pca import pca_project

    cols = ["ALT[m]", "Tisa[K]", "TAS[m/s]"]
    proj, ev = pca_project(sset.df, cols, k=2, keep=["record_id", "seq"])
    assert len(ev) == 2
    assert ev[0] > 0.8  # ALT/Tisa/TAS strongly correlated -> 1 dominant axis
    assert sum(ev) <= 1.0 + 1e-9
    row = proj.select("pc1", "pc2").first()
    assert np.isfinite(row["pc1"]) and np.isfinite(row["pc2"])
    assert proj.count() == sset.df.count()


# ---------------------------------------------------------------- OLS


def test_ols_recovers_linear_relation(spark):
    rng = np.random.default_rng(3)
    n = 2000
    x1 = rng.uniform(0, 10, n)
    x2 = rng.uniform(-5, 5, n)
    y = 2.0 + 3.0 * x1 - 1.5 * x2 + rng.normal(0, 0.1, n)
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"x1": x1, "x2": x2, "y": y}))
    from tabata_spark.ml.ols import ols, predict_with_interval

    res = ols(df, "y", ["x1", "x2"])
    assert abs(res.intercept - 2.0) < 0.05
    assert abs(res.coefficients["x1"] - 3.0) < 0.01
    assert abs(res.coefficients["x2"] + 1.5) < 0.01
    assert res.r2 > 0.99
    assert res.p_values["x1"] < 1e-6
    assert res.n == n
    assert "R2" in res.summary()
    pred = predict_with_interval(df, res)
    row = pred.select("y", "pred", "pred_lo", "pred_hi").first()
    assert row["pred_lo"] < row["pred"] < row["pred_hi"]
    # ~95% of rows inside the prediction interval
    inside = pred.filter(
        (F.col("y") >= F.col("pred_lo")) & (F.col("y") <= F.col("pred_hi"))
    ).count()
    assert inside / n > 0.9


# ---------------------------------------------------------------- viz


def test_viz_adapters(sset):
    from tabata_spark import viz

    pdf = viz.plot_data(sset, "ALT", 0)
    assert "ALT[m]" in pdf.columns
    assert pdf.index.name == sset.records[0]

    grid = viz.groupplot_data(sset, "ALT", records=sset.records[:3])
    assert set(grid.columns) == set(sset.records[:3])
    # standardized: per-record mean ~0, std ~1
    assert abs(grid[sset.records[0]].dropna().mean()) < 1e-6

    a, b = viz.doubleplot_data(sset, ["ALT", "Vz"], 0)
    assert list(a.columns) == ["ALT[m]", "Vz[m/s]"]
    assert "Tisa[K]" in b.columns

    if not viz.HAS_PLOTLY:
        with pytest.raises(ImportError):
            viz.render_plot(sset, "ALT", 0)


def test_viz_tube_and_scores(sset):
    from tabata_spark import viz
    from tabata_spark.ml.tube import Tube

    tube = Tube(sset, seed=42)
    tube.variables = {"Tisa[K]"}
    tube.factors = {"ALT[m]", "Tisa[K]"}
    tube.learn_params = dict(
        retry_number=2, keep_best_number=2, samples_percent=0.05, max_features=2
    )
    tube.fit()
    td = viz.tube_plot_data(tube, "Tisa[K]", 0)
    assert {"y", "z", "zmin", "zmax"} <= set(td.columns)
    sd = viz.scores_plot_data(tube)
    assert "score_Tisa[K]" in sd.columns


# ------------------------------------------------------------- ingest


def test_from_record_files_csv(tmp_path, spark, flights):
    from tabata_spark.sources.ingest import from_record_files

    d = tmp_path / "csvs"
    d.mkdir()
    names = sorted(flights)[:2]
    for n in names:
        pdf = flights[n].reset_index().rename(columns={"index": "t"})
        pdf.to_csv(d / f"{n}.csv", index=False)
    ss = from_record_files(spark, str(d / "*.csv"), fmt="csv", ts_col="t")
    assert ss.records == names
    assert ss.record(names[0]).count() == len(flights[names[0]])
    mx = ss.df.groupBy("record_id").agg(F.max("seq").alias("m")).collect()
    for r in mx:
        assert r["m"] == len(flights[r["record_id"]]) - 1


def test_from_hdf5_gated_without_pytables(spark, tmp_path):
    """HDF5 ingest must fail with a clear ImportError when pytables is
    absent (this environment), not a cryptic pandas stack."""
    from tabata_spark.sources.ingest import from_hdf5

    try:
        import tables  # noqa: F401

        pytest.skip("pytables installed; gating not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError):
        from_hdf5(spark, str(tmp_path / "store.h5"))


def test_selector_empty_store_raises_descriptive_error(tmp_path, spark, sset):
    """ADVICE r15: a store that EXISTS but holds zero records must
    raise a descriptive ValueError from mark_viewed/label, not a
    ZeroDivisionError from the pos % len(records) in _name."""
    import types

    import pytest as _pytest

    from tabata_spark.compat import Selector

    store = str(tmp_path / "empty_rec_store")
    sset.save(store)
    sel = Selector(store, spark=spark)
    # simulate the zero-record store the constructor's existence check
    # does not exclude
    sel.sset = types.SimpleNamespace(records=[])
    with _pytest.raises(ValueError, match="no records"):
        sel.mark_viewed(0)
    with _pytest.raises(ValueError, match="no records"):
        sel.label(0, 10)
    with _pytest.raises(ValueError, match="no records"):
        sel._name(0)
