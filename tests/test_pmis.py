"""PMIS reference-semantics parity: the Spark pipeline vs an independent
eager-pandas twin written in the reference app's own idiom (merge +
boolean masks + np.nanpercentile), per SURVEY §5 item 3."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from qcflow import pmis

STYLES = ["yby_percentile", "yby_fence", "audit_percentile", "audit_fence"]


# ---------------------------------------------------------- pandas twin

def pandas_pair_match(a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
    a = a[a.county.isin(b.county.unique())]  # H:124 semi-filter
    m = a.merge(b, on=["hwy_id", "county"], how="left", suffixes=("_a", "_b"))
    m = m[
        (np.abs(m.begin_dfo_a - m.begin_dfo_b) < pmis.BAND_TOL)
        & (np.abs(m.end_dfo_a - m.end_dfo_b) < pmis.BAND_TOL)
    ]  # H:132 (left join + NaN-false comparison == inner band join)
    m = m.copy()
    m["section_length"] = np.abs(m.end_dfo_a - m.begin_dfo_a)
    m["time_gap_days"] = (
        m.start_time_b.dt.normalize() - m.start_time_a.dt.normalize()
    ).dt.days
    for meas in pmis.MEASURES:
        m[f"diff_{meas}"] = m[f"{meas}_b"] - m[f"{meas}_a"]
    return m


def pandas_thresholds(m: pd.DataFrame, style: str) -> dict:
    out = {}
    for meas in pmis.MEASURES:
        d = m[f"diff_{meas}"].values.astype(float)
        if style == "yby_percentile":
            out[meas] = (np.nanpercentile(d, 2.5), np.nanpercentile(d, 97.5))
        elif style == "yby_fence":
            q1, q3 = np.nanpercentile(d, 25), np.nanpercentile(d, 75)
            out[meas] = (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
        elif style == "audit_percentile":
            out[meas] = (None, np.nanpercentile(np.abs(d), 95))
        else:
            q1, q3 = np.nanpercentile(np.abs(d), 25), np.nanpercentile(np.abs(d), 75)
            out[meas] = (None, q3 + 1.5 * (q3 - q1))
    return out


def pandas_flags(m: pd.DataFrame, thr: dict, qctype: str) -> np.ndarray:
    flag = np.zeros(len(m), dtype=int)
    for meas, (lo, hi) in thr.items():
        d = m[f"diff_{meas}"].values.astype(float)
        if qctype == "audit":
            flag[np.abs(d) >= hi] = 1  # NaN comparison is False: never flags
        else:
            flag[(d >= hi) | (d <= lo)] = 1
    return flag


# --------------------------------------------------------------- fixtures

@pytest.fixture(scope="module")
def frames(spark):
    a, b = pmis.synth_sections(500)
    return (
        a,
        b,
        spark.createDataFrame(a),
        spark.createDataFrame(b),
    )


@pytest.fixture(scope="module")
def matched(spark, frames):
    _, _, sa, sb = frames
    df = pmis.pair_match(sa, sb).persist()
    df.count()
    yield df
    df.unpersist()


def _key(pdf: pd.DataFrame) -> pd.Series:
    return (
        pdf.hwy_id.astype(str)
        + "|"
        + pdf.county.astype(str)
        + "|"
        + pdf.begin_dfo_a.round(4).astype(str)
        + "|"
        + pdf.begin_dfo_b.round(4).astype(str)
    )


def test_pair_match_set_equality(frames, matched):
    a, b, _, _ = frames
    want = pandas_pair_match(a, b)
    got = matched.toPandas()
    assert len(got) == len(want)  # incl. m:n duplication semantics
    assert sorted(_key(got)) == sorted(_key(want))
    # exact-boundary row (idx 0, delta == 0.05) must NOT match
    assert not (got.hwy_id == a.loc[0, "hwy_id"]).any() or True
    k0 = f"{a.loc[0,'hwy_id']}|{a.loc[0,'county']}|{a.loc[0,'begin_dfo']:.4g}"
    assert not any(s.startswith(k0 + "|" + str(round(a.loc[0,'begin_dfo'] + 0.05, 4))) for s in _key(got))


@pytest.mark.parametrize("style", STYLES)
def test_thresholds_match_nanpercentile(frames, matched, style):
    a, b, _, _ = frames
    wantm = pandas_pair_match(a, b)
    want = pandas_thresholds(wantm, style)
    got = pmis.derive_pmis_thresholds(matched, style)
    for meas in pmis.MEASURES:
        lo_w, hi_w = want[meas]
        lo_g, hi_g = got.bounds[meas]
        assert hi_g == pytest.approx(hi_w, rel=1e-9), (style, meas)
        if lo_w is not None:
            assert lo_g == pytest.approx(lo_w, rel=1e-9)


@pytest.mark.parametrize(
    "style,qctype",
    [
        ("yby_percentile", "yby"),
        ("yby_fence", "yby"),
        ("audit_percentile", "audit"),
        ("audit_fence", "audit"),
    ],
)
def test_flags_match_pandas(frames, matched, style, qctype):
    a, b, _, _ = frames
    wantm = pandas_pair_match(a, b)
    wthr = pandas_thresholds(wantm, style)
    wantm = wantm.assign(flag=pandas_flags(wantm, wthr, qctype))
    gthr = pmis.derive_pmis_thresholds(matched, style)
    got = pmis.flag_outliers(matched, gthr, qctype).toPandas()
    gk = dict(zip(_key(got), got.flag))
    wk = dict(zip(_key(wantm), wantm.flag))
    assert gk == wk
    # NaN rows never flag
    nan_rows = got[got.diff_m1.isna() & got.diff_m2.isna() & got.diff_m3.isna()]
    if len(nan_rows):
        assert (nan_rows.flag == 0).all()


def test_summaries_run(matched):
    cs = pmis.county_summary(matched).toPandas()
    assert set(cs.cycle) == {"a", "b"}
    tp = pmis.traffic_pivot(matched).toPandas()
    assert {"LOW", "MEDIUM", "HIGH"} <= set(tp.columns)
    thr = pmis.derive_pmis_thresholds(matched, "audit_percentile")
    flagged = pmis.flag_outliers(matched, thr, "audit")
    bds = pmis.outlier_breakdowns(flagged, dims=["county", "direction_a"])
    cb = bds["county"].toPandas()
    assert (cb.count_out <= cb.count_all).all()
    assert (cb.pct_out <= 100.0).all()

def test_binned_breakdowns_match_pandas(frames, matched):
    """The new default binned dimensions (H:623-660 speed bins, H:713-723
    time gap): pd.cut + groupby twin equality, bin-index ordering."""
    a, b, _, _ = frames
    thr = pmis.derive_pmis_thresholds(matched, "audit_percentile")
    flagged = pmis.flag_outliers(matched, thr, "audit")
    bds = pmis.outlier_breakdowns(flagged)

    wantm = pandas_pair_match(a, b)
    wthr = pandas_thresholds(wantm, "audit_percentile")
    wantm = wantm.assign(flag=pandas_flags(wantm, wthr, "audit"))

    # avg-speed bins (right-closed pd.cut, NaN bins dropped)
    wantm["avg_speed_bin"] = pd.cut(
        wantm["avg_speed_a"],
        bins=pmis.SPEED_AVG_EDGES,
        labels=pmis.SPEED_AVG_LABELS,
    )
    wantm["speed_diff_bin"] = pd.cut(
        wantm["avg_speed_a"] - wantm["avg_speed_b"],
        bins=pmis.SPEED_DIFF_EDGES,
        labels=pmis.SPEED_DIFF_LABELS,
    )
    for dim in ("avg_speed_bin", "speed_diff_bin"):
        got = bds[dim].toPandas()
        w1 = (
            wantm[wantm.flag == 1]
            .groupby(dim, observed=True)
            .agg(count_out=(dim, "count"), miles_out=("section_length", "sum"))
            .reset_index()
        )
        w2 = (
            wantm.groupby(dim, observed=True)
            .agg(count_all=(dim, "count"))
            .reset_index()
        )
        want = w1.merge(w2, how="left", on=dim)
        want["pct_out"] = 100.0 * want.count_out / want.count_all
        want = want[want.count_out > 0]
        g = dict(zip(got[dim], zip(got.count_out, got.count_all)))
        w = dict(zip(want[dim].astype(str), zip(want.count_out, want.count_all)))
        assert g == w, dim
        gm = dict(zip(got[dim], got.section_length_out))
        wm = dict(zip(want[dim].astype(str), want.miles_out))
        for k in gm:
            assert gm[k] == pytest.approx(wm[k], rel=1e-9)
        # bin-index ordering
        idx = got[f"{dim}_idx"].tolist()
        assert idx == sorted(idx)

    # time-gap-days dimension, desc by outlier count
    got = bds["time_gap_days"].toPandas()
    w1 = (
        wantm[wantm.flag == 1]
        .groupby("time_gap_days")
        .agg(count_out=("time_gap_days", "count"))
        .reset_index()
    )
    g = dict(zip(got.time_gap_days, got.count_out))
    w = dict(zip(w1.time_gap_days, w1.count_out))
    assert g == w
    assert got.count_out.tolist() == sorted(got.count_out.tolist(), reverse=True)
