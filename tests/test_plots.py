"""Figure-building layer tests (reference plots.py parity at the
FigureSpec level — rendering itself is import-gated)."""

import numpy as np
import pandas as pd
import pytest

from tabata_spark import plots as P


@pytest.fixture()
def frame():
    idx = pd.RangeIndex(50)
    df = pd.DataFrame(
        {
            "ALT[m]": np.linspace(0, 1000, 50),
            "TAS[m/s]": np.linspace(100, 200, 50),
            "Tisa[K]": np.full(50, 288.0),  # zero variance
            "label": ["x"] * 50,  # non-numeric
        },
        index=idx,
    )
    df.index.name = "rec_demo"
    return df


def test_selplot_builds_named_value_trace(frame):
    spec = P.selplot(frame, "ALT")
    assert len(spec.traces) == 1
    assert spec.traces[0].name == "value"
    assert spec.title == "ALT"
    assert spec.yaxis_title == "m"
    assert spec.xaxis_title == "rec_demo"
    assert spec.traces[0].y[-1] == 1000.0


def test_byunitplot_groups_by_unit(frame):
    spec = P.byunitplot(frame, yunit="m")
    assert [t.name for t in spec.traces] == ["ALT"]
    assert spec.yaxis_title == "[m]"
    spec2 = P.byunitplot(frame, yunit="m/s")
    assert [t.name for t in spec2.traces] == ["TAS"]


def test_groupplot_standardize_skips_zero_variance(frame):
    spec = P.groupplot(frame, standardize=True)
    names = [t.name for t in spec.traces]
    assert "Tisa[K]" not in names  # std == 0 skipped
    assert "label" not in names  # non-numeric skipped
    assert set(names) == {"ALT[m]", "TAS[m/s]"}
    y = np.array(spec.traces[0].y)
    assert abs(y.mean()) < 1e-12 and abs(y.std(ddof=1) - 1) < 1e-12
    # without standardization every numeric column appears
    assert len(P.groupplot(frame).traces) == 3


def test_doubleplot_column_split_and_domains(frame):
    spec = P.doubleplot(frame[["ALT[m]", "TAS[m/s]", "Tisa[K]"]], "ALT")
    top = [t for t in spec.traces if t.row == 1]
    bottom = [t for t in spec.traces if t.row == 2]
    assert [t.name for t in top] == ["ALT[m]"]
    assert {t.name for t in bottom} == {"TAS[m/s]", "Tisa[K]"}
    assert spec.row_domains[1] == (0.5, 1.0)
    assert spec.row_domains[2] == (0.0, 0.45)
    assert spec.row_titles[1] == "m"  # single-unit panel labeled
    assert spec.nrows == 2


def test_tsplot_selects_columns(frame):
    spec = P.tsplot(frame, cols=["TAS"])
    assert [t.name for t in spec.traces] == ["TAS[m/s]"]


def test_pcacircle_loadings_inside_unit_circle():
    rng = np.random.default_rng(3)
    base = rng.normal(size=200)
    df = pd.DataFrame(
        {
            "a[u]": base + 0.05 * rng.normal(size=200),
            "b[u]": -base + 0.05 * rng.normal(size=200),
            "c[u]": rng.normal(size=200),
        }
    )
    spec = P.pcacircle(df, sample=0.2)
    tips = spec.traces[0]
    assert tips.mode == "markers+text"
    assert list(tips.text) == list(df.columns)
    # correlation-circle invariant: |tip| <= sqrt(n/(n-1)) — the
    # ddof-0 scaler vs ddof-1 eigenvalue mismatch the reference's
    # StandardScaler+PCA pairing has too
    r = np.hypot(np.array(tips.x), np.array(tips.y))
    assert (r <= np.sqrt(200 / 199) + 1e-9).all()
    # a and b are anti-correlated -> opposite sides, both near the rim
    assert r[0] > 0.9 and r[1] > 0.9
    assert np.sign(tips.x[0]) != np.sign(tips.x[1])
    # one dotted arrow per variable + observation cloud
    arrows = [t for t in spec.traces[1:] if t.dash]
    assert len(arrows) == len(df.columns)
    assert spec.traces[-1].name == "obs"
    assert spec.shapes[0]["type"] == "circle"
    assert "PC1" in spec.title


def test_record_figure_phase_overlay(sset):
    from tabata_spark.operators.flight import with_cruise_flag
    from tabata_spark.core.signalset import SignalSet

    flagged = SignalSet(with_cruise_flag(sset.df), phase="CR")
    spec = P.record_figure(flagged, "ALT", pos=0)
    assert [t.name for t in spec.traces] == ["value", "phase"]
    assert spec.traces[1].mode == "markers"
    assert len(spec.traces[1].x) < len(spec.traces[0].x)  # subset
    assert spec.yaxis_title == "m"


def test_scores_and_tube_figures(sset):
    from tabata_spark.ml.tube import Tube

    tube = Tube(sset, seed=7)
    tube.variables = {"ALT[m]"}
    tube.factors = {"ALT[m]", "Tisa[K]", "TAS[m/s]"}
    tube.learn_params = dict(
        retry_number=2, keep_best_number=2, samples_percent=0.05, max_features=3
    )
    tube.fit()
    spec = P.scores_figure(tube)
    assert spec.barmode == "stack"
    assert [t.kind for t in spec.traces] == ["bar"]
    assert all(0 <= v <= 1 for v in spec.traces[0].y)  # proportions
    tspec = P.tube_figure(tube, "ALT[m]", pos=0)
    assert [t.name for t in tspec.traces] == ["ALT[m]", "z", "zmin", "zmax"]
    zmin = np.array(tspec.traces[2].y)
    zmax = np.array(tspec.traces[3].y)
    assert (zmin <= zmax + 1e-9).all()


def test_show_raises_without_renderer(frame):
    spec = P.selplot(frame)
    if not (P.HAS_PLOTLY or P.HAS_MPL):
        with pytest.raises(ImportError):
            spec.show()


def test_legacy_entry_point_aliases(frame):
    """The reference's `*c` (cufflinks) / `*m` (matplotlib) chart
    variants (reference plots.py:99-123,162-188,243-274,304-333,
    392-448,492-529,608-664) exist as thin aliases of the FigureSpec
    builders, with the reference's exact signatures."""
    base = P.selplot(frame, "ALT")
    for fn in (P.selplotc, P.selplotm):
        spec = fn(frame, "ALT", sep="[")
        assert spec.title == base.title
        assert spec.traces[0].y == base.traces[0].y
    assert [t.name for t in P.byunitplotm(frame, yunit="m").traces] == ["ALT"]
    assert len(P.groupplotm(frame, standardize=True).traces) == 2
    assert P.doubleplotm(frame[["ALT[m]", "TAS[m/s]"]], "ALT").traces
    assert [t.name for t in P.tsplotm(frame, ["ALT"]).traces] == ["ALT[m]"]
    pq = P.pcacirclem(frame[["ALT[m]", "TAS[m/s]", "Tisa[K]"]], pca=None)
    assert pq.title == P.pcacircle(frame[["ALT[m]", "TAS[m/s]", "Tisa[K]"]]).title
    # the sep argument is signature-compat only: a non-default value
    # cannot be honored against the fixed NAME[UNIT] convention
    with pytest.raises(ValueError):
        P.selplotc(frame, "ALT", sep="(")


def test_opset_error_type_and_aliases():
    """OpsetError (reference opset.py:39-49): ValueError subclass with
    (filename, message) attributes, importable from the package root
    and the compat facade; Opset/Selector grow the reference's plotc
    entry point."""
    import tabata_spark
    from tabata_spark import compat
    from tabata_spark.core.signalset import OpsetError

    assert tabata_spark.OpsetError is OpsetError is compat.OpsetError
    assert issubclass(OpsetError, ValueError)
    err = OpsetError("store.parquet", "Opset is empty.")
    assert err.filename == "store.parquet" and err.message == "Opset is empty."
    assert str(err) == "Opset(store.parquet)\n    Opset is empty."
    assert callable(compat.Opset.plotc)
    assert compat.Selector.plotc is compat.Opset.plotc


def test_opset_error_raised_from_load_put_and_position(spark, sset, flights):
    from tabata_spark.core.signalset import OpsetError, SignalSet

    name = sorted(flights)[0]
    # load path: a frame without the structural columns
    with pytest.raises(OpsetError):
        SignalSet(spark.range(3).toDF("x"))
    # put path: no record name anywhere
    pdf = flights[name].copy()
    pdf.index.name = None
    with pytest.raises(OpsetError):
        sset.put(pdf)
    # position path: out-of-range cursor (reference opset.py:149)
    with pytest.raises(OpsetError):
        sset.record(len(sset.records) + 5)
    # still catchable as ValueError (pre-existing caller contract)
    with pytest.raises(ValueError):
        sset.record(-len(sset.records) - 1)
