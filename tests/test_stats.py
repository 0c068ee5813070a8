"""Independent numpy pins for the statistics tier.

The DuckDB oracles prove cross-engine PARITY, but both sides were
written from the same reading of each formula — a shared
misimplementation would pass. These tests recompute every statistic
from the raw parquet with plain numpy (textbook formulas, no shared
code) and require agreement to ~1e-3 relative, so the FORMULAS are
pinned by a third implementation (the `emb_kmeans` discipline).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from .conftest import SF_SMOKE

QUERIES = entrymod.queries()


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMOKE}/events.parquet")


def _documents() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMOKE}/documents.parquet")


def _close(a: float, b: float, tol: float = 1e-3) -> bool:
    return abs(a - b) <= tol * max(1.0, abs(a), abs(b))


def test_welch_t_matches_numpy(spark):
    row = (
        QUERIES["events_ab_welch"](spark, SF_SMOKE).toPandas().iloc[0]
    )
    ev = _events()
    a = ev.loc[ev.event_type == "purchase", "value"].to_numpy()
    b = ev.loc[ev.event_type == "click", "value"].to_numpy()
    va, vb = a.var(ddof=1), b.var(ddof=1)
    na, nb = len(a), len(b)
    se2 = va / na + vb / nb
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    df = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert row["n_a"] == na and row["n_b"] == nb
    assert _close(row["t_stat"], t)
    assert _close(row["df_welch"], df)
    assert _close(row["mean_a"], a.mean())


def test_anova_f_matches_numpy(spark):
    row = QUERIES["doc_anova_length"](spark, SF_SMOKE).toPandas().iloc[0]
    d = _documents()
    groups = [g.to_numpy(float) for _, g in d.groupby("lang")["n_chars"]]
    n = sum(len(g) for g in groups)
    k = len(groups)
    grand = np.concatenate(groups).mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["n_docs"] == n and row["n_groups"] == k
    assert _close(row["f_stat"], f)
    assert _close(row["eta_squared"], ssb / (ssb + ssw))


def test_mann_kendall_matches_numpy(spark):
    row = (
        QUERIES["events_mann_kendall"](spark, SF_SMOKE).toPandas().iloc[0]
    )
    ev = _events()
    hourly = (
        ev.set_index("ts")
        .resample("1h")["event_id"]
        .count()
    )
    x = hourly[hourly > 0].to_numpy(float)  # only hours with events
    h = len(x)
    s = int(np.sign(x[None, :] - x[:, None])[np.triu_indices(h, 1)].sum())
    _, counts = np.unique(x, return_counts=True)
    tie = (counts * (counts - 1) * (2 * counts + 5)).sum()
    var = (h * (h - 1) * (2 * h + 5) - tie) / 18.0
    z = (s - np.sign(s)) / math.sqrt(var) if s != 0 else 0.0
    assert row["n_hours"] == h
    assert row["s_stat"] == s
    assert _close(row["var_s"], var)
    assert _close(row["z_stat"], z, tol=1e-3)


def test_chi2_matches_numpy(spark):
    row = (
        QUERIES["corpus_chi2_independence"](spark, SF_SMOKE)
        .toPandas()
        .iloc[0]
    )
    d = _documents()
    ct = pd.crosstab(d["lang"], d["source"]).to_numpy(float)
    n = ct.sum()
    exp = np.outer(ct.sum(1), ct.sum(0)) / n
    chi2 = ((ct - exp) ** 2 / exp).sum()
    dof = (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert row["dof"] == dof
    assert _close(row["chi2"], chi2)
    assert _close(
        row["cramers_v"],
        math.sqrt(chi2 / (n * min(ct.shape[0] - 1, ct.shape[1] - 1))),
    )


def test_ks_drift_matches_numpy(spark):
    row = QUERIES["corpus_ks_drift"](spark, SF_SMOKE).toPandas().iloc[0]
    df = (
        QUERIES["doc_quality"](spark, SF_SMOKE)
        .select("doc_id", "quality_score")
        .toPandas()
        .sort_values("doc_id")
    )
    mid = df["doc_id"].median()
    q1 = df.loc[df.doc_id <= mid, "quality_score"].to_numpy()
    q2 = df.loc[df.doc_id > mid, "quality_score"].to_numpy()
    grid = np.unique(np.concatenate([q1, q2]))
    cdf1 = np.searchsorted(np.sort(q1), grid, side="right") / len(q1)
    cdf2 = np.searchsorted(np.sort(q2), grid, side="right") / len(q2)
    d_ks = np.abs(cdf1 - cdf2).max()
    assert row["n_first_half"] == len(q1)
    assert row["n_second_half"] == len(q2)
    assert _close(row["ks_d"], d_ks)


def test_weighted_sample_priorities(spark):
    """E-S priorities: recompute −ln(u)/w for the selected rows and
    confirm the catalog's K rows are exactly the K smallest over the
    whole corpus (selection correctness, not just value parity)."""
    out = (
        QUERIES["corpus_sample_weighted"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("priority")
    )
    assert len(out) == 100
    assert out["priority"].is_monotonic_increasing
    assert (out["weight"] >= 1).all()


def test_discount_ols_matches_numpy(spark):
    row = (
        QUERIES["lineitem_discount_effect"](spark, SF_SMOKE)
        .toPandas()
        .iloc[0]
    )
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    x = np.round(li["l_discount"].to_numpy() * 100)
    y = li["l_quantity"].to_numpy(float)
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert row["n_rows"] == len(li)
    assert _close(row["slope_per_point"], slope, tol=1e-3)
    assert _close(row["intercept_qty"], intercept, tol=1e-3)
    assert _close(row["r2"], r * r, tol=1e-3)


def test_pvm_bridge_identity(spark):
    df = QUERIES["orders_pvm_bridge"](spark, SF_SMOKE).toPandas()
    assert len(df) > 0
    resid = (df.delta_rev - df.volume_effect - df.price_effect).abs()
    assert resid.max() <= 0.02  # cents-rounding of the two effects


def test_ewma_control_matches_numpy(spark):
    df = (
        QUERIES["events_ewma_control"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    ev = _events()
    hourly = (
        ev.set_index("ts").resample("1h")["event_id"].count()
    )
    hourly = hourly[hourly > 0]
    hours = hourly.index.to_numpy()
    xs = hourly.to_numpy(float)
    lam = 0.3
    for probe in (1, len(xs) // 2, len(xs) - 1):
        t = hours[probe]
        dh = (t - hours[:probe]) / np.timedelta64(1, "h")
        w = (1 - lam) ** dh
        expect = (w * xs[:probe]).sum() / w.sum()
        got = float(
            df.loc[df.hour == pd.Timestamp(t), "ewma_prior"].iloc[0]
        )
        assert _close(got, expect, tol=1e-3)


def test_abc_classification_invariants(spark):
    df = (
        QUERIES["orders_abc_class"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("cum_share")
        .reset_index(drop=True)
    )
    # cum_share ascending == rank order (rev desc, key), so revenue
    # must be non-increasing along the curve
    assert (df.revenue.diff().dropna() <= 1e-9).all()
    a = df[df.abc_class == "A"]
    b = df[df.abc_class == "B"]
    c = df[df.abc_class == "C"]
    assert (a.cum_share <= 0.80).all()
    assert ((b.cum_share > 0.80) & (b.cum_share <= 0.95)).all()
    assert (c.cum_share > 0.95).all()
    assert len(a) + len(b) + len(c) == len(df)
    # top-revenue parts are never class C while tail parts are never A
    assert df.iloc[0].abc_class == "A"
    assert df.iloc[-1].abc_class == "C"


def test_flat_corpus_guards(spark, tmp_path):
    """Degenerate inputs must yield NULL statistics in BOTH engines,
    never an engine-dependent Inf/NaN: constant doc lengths (SSW=0)
    for ANOVA, constant values (zero variance) for Welch."""
    import duckdb

    docs = pd.DataFrame(
        {
            "doc_id": range(10),
            "text": ["alpha beta gamma"] * 10,
            "lang": ["en", "fr"] * 5,
            "source": ["s0"] * 10,
            "n_chars": [16] * 10,
        }
    )
    ev = pd.DataFrame(
        {
            "event_id": range(8),
            "ts": pd.date_range("2024-01-01", periods=8, freq="1h"),
            "user_id": [1, 2] * 4,
            "event_type": ["purchase", "click"] * 4,
            "value": [5.0] * 8,
            "props": ["{}"] * 8,
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    ev.to_parquet(tmp_path / "events.parquet")
    sf = str(tmp_path)

    row = QUERIES["doc_anova_length"](spark, sf).toPandas().iloc[0]
    assert row["n_docs"] == 10 and row["n_groups"] == 2
    assert pd.isna(row["f_stat"]) and pd.isna(row["eta_squared"])

    row = QUERIES["events_ab_welch"](spark, sf).toPandas().iloc[0]
    assert row["n_a"] == 4 and row["n_b"] == 4
    assert pd.isna(row["t_stat"]) and pd.isna(row["df_welch"])

    # the DuckDB twins agree on the NULL verdicts
    con = duckdb.connect()
    for t in ["documents", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    import __spark_entry__ as em

    osql = em.oracle_sql()
    d = con.execute(osql["doc_anova_length"]).df().iloc[0]
    assert pd.isna(d["f_stat"]) and pd.isna(d["eta_squared"])
    w = con.execute(osql["events_ab_welch"]).df().iloc[0]
    assert pd.isna(w["t_stat"]) and pd.isna(w["df_welch"])


def test_trade_balance_conservation(spark):
    """Cross-nation flows are zero-sum: every export is someone's
    import, so net balances must sum to 0 exactly (cents grid)."""
    df = QUERIES["nation_trade_balance"](spark, SF_SMOKE).toPandas()
    assert len(df) > 0
    assert abs(df.net_balance.sum()) < 0.01
    assert abs(df.exports.sum() - df.imports.sum()) < 0.01


def test_levene_matches_numpy(spark):
    row = (
        QUERIES["events_value_levene"](spark, SF_SMOKE)
        .toPandas()
        .iloc[0]
    )
    ev = _events()
    v = np.floor(ev["value"].to_numpy() * 100 + 0.5)
    types = ev.event_type.to_numpy()
    zs = []
    for g in ev.event_type.unique():
        x = v[types == g]
        zs.append(np.abs(x - np.median(x)))
    n = sum(len(z) for z in zs)
    k = len(zs)
    zbar = np.concatenate(zs).mean()
    between = sum(len(z) * (z.mean() - zbar) ** 2 for z in zs)
    within = sum(((z - z.mean()) ** 2).sum() for z in zs)
    f = ((n - k) / (k - 1)) * between / within
    assert row["n_events"] == n
    assert row["k_groups"] == k
    assert _close(row["f_stat"], f)


def test_kruskal_matches_numpy(spark):
    row = (
        QUERIES["events_value_kruskal"](spark, SF_SMOKE)
        .toPandas()
        .iloc[0]
    )
    ev = _events()
    v = np.floor(ev["value"].to_numpy() * 100 + 0.5)
    r = pd.Series(v).rank(method="average").to_numpy()
    n = len(v)
    srr = sum(
        r[ev.event_type.to_numpy() == g].sum() ** 2
        / (ev.event_type == g).sum()
        for g in ev.event_type.unique()
    )
    h = 12.0 / (n * (n + 1)) * srr - 3 * (n + 1)
    _, counts = np.unique(v, return_counts=True)
    corr = 1 - (counts**3 - counts).sum() / (n**3 - n)
    h /= corr
    assert row["n_events"] == n
    assert row["k_groups"] == ev.event_type.nunique()
    assert _close(row["h_stat"], h)
    assert _close(row["tie_correction"], corr)


def test_spearman_matches_pandas(spark):
    row = (
        QUERIES["corpus_quality_length_spearman"](spark, SF_SMOKE)
        .toPandas()
        .iloc[0]
    )
    q = (
        QUERIES["doc_quality"](spark, SF_SMOKE)
        .select("doc_id", "quality_score")
        .toPandas()
    )
    d = _documents().merge(q, on="doc_id")
    rho = (
        d["n_chars"]
        .rank(method="average")
        .corr(d["quality_score"].rank(method="average"))
    )
    assert row["n"] == len(d)
    assert _close(row["spearman_rho"], rho)


def test_periodogram_matches_numpy(spark):
    df = (
        QUERIES["events_periodogram"](spark, SF_SMOKE)
        .toPandas()
        .set_index("period_h")
    )
    ev = _events()
    hourly = ev.set_index("ts").resample("1h")["event_id"].count()
    hourly = hourly[hourly > 0]
    t = (
        (hourly.index - hourly.index.min())
        / np.timedelta64(1, "h")
    ).to_numpy(float)
    x = hourly.to_numpy(float) - hourly.mean()
    n = len(x)
    for p in (6, 24, 168):
        arg = 2 * np.pi * t / p
        power = (
            (x * np.cos(arg)).sum() ** 2 + (x * np.sin(arg)).sum() ** 2
        ) * 2 / n
        assert _close(df.loc[p, "power"], power, tol=1e-3)


def test_cusum_matches_recursion(spark):
    """The closed-form window CUSUM must equal Page's textbook
    recursion S_i = max(0, S_{i-1} + (x_i - mean - k)) with integer
    allowance k = ceil(sigma/2), run in plain numpy over each
    per-type hourly series."""
    df = (
        QUERIES["events_cusum"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(["event_type", "hour"])
        .reset_index(drop=True)
    )
    ev = _events()
    for et, grp in df.groupby("event_type"):
        hourly = (
            ev[ev.event_type == et]
            .set_index("ts")
            .resample("1h")["event_id"]
            .count()
        )
        hourly = hourly[hourly > 0]
        xs = hourly.to_numpy(float)
        mu = xs.mean()
        sigma = xs.std(ddof=1)
        k = math.ceil(sigma / 2) if len(xs) > 1 and sigma > 0 else 0
        s, expect = 0.0, []
        for x in xs:
            s = max(0.0, s + (x - mu - k))
            expect.append(s)
        got = grp.sort_values("hour")["cusum"].to_numpy(float)
        assert len(got) == len(expect)
        for g, e in zip(got, expect):
            assert _close(g, e, tol=1e-3)
        alarms = grp.sort_values("hour")["alarm"].to_numpy()
        for g, e in zip(alarms, expect):
            assert bool(g) == bool(e > 5 * sigma)


def test_cusum_flags_injected_drift(spark):
    """A small persistent +2sigma shift in the back half of a flat
    series must raise the CUSUM alarm even though no single hour is
    individually anomalous (the detector's reason to exist)."""
    from llm_map_reduce_summarizer_spark.plans.events import (
        cusum_from_hourly,
    )

    base = pd.Timestamp("2024-01-01")
    rng = np.random.default_rng(7)
    n = 200
    xs = rng.poisson(100, n).astype(float)
    xs[n // 2 :] += 2 * xs.std(ddof=1)
    rows = [
        (
            "drift",
            (base + pd.Timedelta(hours=i)).to_pydatetime(),
            float(xs[i]),
        )
        for i in range(n)
    ]
    hourly = spark.createDataFrame(
        rows, "event_type string, hour timestamp, n_events double"
    )
    out = cusum_from_hourly(
        hourly.selectExpr(
            "event_type", "hour", "CAST(n_events AS long) AS n_events"
        )
    ).toPandas()
    assert out["alarm"].fillna(False).any()
    # and a drift-free flat series must stay quiet
    quiet = [
        (
            "flat",
            (base + pd.Timedelta(hours=i)).to_pydatetime(),
            int(v),
        )
        for i, v in enumerate(rng.poisson(100, n))
    ]
    hq = spark.createDataFrame(
        quiet, "event_type string, hour timestamp, n_events long"
    )
    out_q = cusum_from_hourly(hq).toPandas()
    assert not out_q["alarm"].fillna(False).any()


def test_sen_slope_matches_numpy(spark):
    row = (
        QUERIES["events_sen_slope"](spark, SF_SMOKE)
        .toPandas()
        .iloc[0]
    )
    ev = _events()
    hourly = ev.set_index("ts").resample("1h")["event_id"].count()
    hourly = hourly[hourly > 0]
    t = (
        hourly.index.astype("datetime64[us]").astype("int64")
        // 10**6
        // 3600
    ).to_numpy(float)
    x = hourly.to_numpy(float)
    slopes = [
        (x[j] - x[i]) / (t[j] - t[i])
        for i in range(len(x))
        for j in range(i + 1, len(x))
    ]
    sen = float(np.median(slopes))
    icept = float(np.median(x - sen * t))
    assert row["n_pairs"] == len(slopes)
    assert _close(row["sen_slope"], sen, tol=1e-3)
    assert _close(row["sen_intercept"], icept, tol=1e-3)


def test_lognormal_jb_matches_numpy(spark):
    df = (
        QUERIES["corpus_length_lognormal"](spark, SF_SMOKE)
        .toPandas()
        .set_index("source")
    )
    d = _documents()
    d = d[d.n_chars > 0]
    for src, grp in d.groupby("source"):
        x = np.log(grp["n_chars"].to_numpy(float))
        n = len(x)
        mu, m2 = x.mean(), x.var()
        m3 = ((x - mu) ** 3).mean()
        m4 = ((x - mu) ** 4).mean()
        g1 = m3 / m2**1.5
        g2 = m4 / m2**2 - 3
        jb = n / 6 * (g1**2 + g2**2 / 4)
        row = df.loc[src]
        assert row["n"] == n
        assert _close(row["mu_log"], mu, tol=1e-3)
        assert _close(row["sigma_log"], x.std(ddof=1), tol=1e-3)
        if n > 2 and m2 > 0:
            assert _close(row["jb_stat"], jb, tol=1e-3)


def test_vocab_coverage_matches_numpy(spark):
    """Top-k token-mass coverage: ties are mass-neutral (equal counts
    contribute equally), so a plain numpy sort-desc cumsum must agree
    exactly with the ff-table bracketing computation."""
    df = (
        QUERIES["corpus_vocab_coverage"](spark, SF_SMOKE)
        .toPandas()
        .set_index("vocab_size")
        .sort_index()
    )
    d = _documents()
    from collections import Counter

    cnt = Counter()
    for t in d["text"]:
        cnt.update(t.strip().lower().split())
    xs = np.sort(np.array(list(cnt.values()), float))[::-1]
    total = xs.sum()
    for k in df.index:
        expect = xs[: int(min(k, len(xs)))].sum() / total
        assert _close(df.loc[k, "mass_coverage"], expect, tol=1e-4)
        assert df.loc[k, "vocab_total"] == len(xs)
    assert df["mass_coverage"].is_monotonic_increasing


def test_isotropy_matches_numpy(spark):
    """The sum-vector identity must equal the literal n-squared pair
    mean of cosines on the small corpus."""
    row = QUERIES["emb_isotropy"](spark, SF_SMOKE).toPandas().iloc[0]
    e = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    u = np.stack(e["embedding"].to_numpy())
    u = u / np.linalg.norm(u, axis=1, keepdims=True)
    g = u @ u.T
    n = len(u)
    mean_cos = (g.sum() - np.trace(g)) / (n * (n - 1))
    assert row["n"] == n
    assert _close(row["mean_pairwise_cos"], mean_cos, tol=1e-4)
    assert _close(row["isotropy"], 1 - abs(mean_cos), tol=1e-4)


def test_jl_projection_matches_numpy(spark):
    """The JL sketch must equal the literal numpy matmul with the
    portable ±1 matrix, and the distortion audit must concentrate
    around ratio 1 (JL lemma sanity)."""
    from llm_map_reduce_summarizer_spark.plans.documents import JL_K
    from llm_map_reduce_summarizer_spark.functions.vectors import DIM

    e = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    x = np.stack(e["embedding"].to_numpy()).astype(float)
    i = np.arange(DIM)[:, None]
    j = np.arange(JL_K)[None, :]
    r = np.where(((i * 131 + j * 137) % 97) % 2 == 0, 1.0, -1.0)
    y = x @ r / math.sqrt(JL_K)

    df = (
        QUERIES["emb_random_projection"](spark, SF_SMOKE)
        .toPandas()
        .set_index(["vec_id", "comp"])["value"]
    )
    for vi, vid in enumerate(e["vec_id"][:20]):
        for c in range(JL_K):
            assert _close(df.loc[(vid, c)], y[vi, c], tol=1e-4)

    row = QUERIES["emb_jl_distortion"](spark, SF_SMOKE).toPandas().iloc[0]
    ratios = (y * y).sum(axis=1) / (x * x).sum(axis=1)
    assert row["n_vecs"] == len(x)
    assert _close(row["mean_ratio"], ratios.mean(), tol=1e-4)
    assert 0.7 < row["mean_ratio"] < 1.3
    share = ((ratios >= 0.75) & (ratios <= 1.25)).mean()
    assert _close(row["share_within_25pct"], share, tol=1e-4)


def test_waterfill_allocation_invariants(spark):
    """Max-min fairness: allocations never exceed availability, all
    uncapped sources sit at the same water level, and the levels sum
    to the budget whenever the budget binds."""
    df = QUERIES["corpus_budget_waterfill"](spark, SF_SMOKE).toPandas()
    budget = df["budget"].iloc[0]
    assert (df["allocation"] <= df["avail"] + 1e-6).all()
    unc = df.loc[~df["capped"], "allocation"]
    assert unc.nunique() <= 1
    if len(unc):
        assert abs(df["allocation"].sum() - budget) < 1e-2
    else:
        assert df["allocation"].sum() <= budget + 1e-2


def test_diff_in_diff_matches_numpy(spark):
    row = (
        QUERIES["events_diff_in_diff"](spark, SF_SMOKE).toPandas().iloc[0]
    )
    ev = _events()
    vq = np.floor(ev["value"].to_numpy() * 100 + 0.5)
    hour = ev["ts"].dt.floor("h").astype("int64") // 1000  # micros
    mid = (hour.min() + hour.max()) / 2.0
    treat = (ev["user_id"] % 2 == 0).to_numpy()
    post = (hour >= mid).to_numpy()
    arms = {
        "tp": vq[treat & post],
        "tc": vq[treat & ~post],
        "cp": vq[~treat & post],
        "cc": vq[~treat & ~post],
    }
    did = (arms["tp"].mean() - arms["tc"].mean()) - (
        arms["cp"].mean() - arms["cc"].mean()
    )
    se2 = sum(a.var(ddof=1) / len(a) for a in arms.values())
    assert _close(row["did_estimate"], did / 100.0)
    assert _close(row["t_stat"], did / math.sqrt(se2))
    assert row["n_treat_pre"] == len(arms["tc"])
    assert row["n_ctrl_post"] == len(arms["cp"])


def test_dp_hourly_noise_bounded_and_deterministic(spark):
    from llm_map_reduce_summarizer_spark.plans.events import DP_EPSILON

    rel = (
        QUERIES["events_dp_hourly"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(["hour", "event_type"])
        .reset_index(drop=True)
    )
    ev = _events()
    true = (
        ev.assign(hour=ev["ts"].dt.floor("h"))
        .groupby(["hour", "event_type"])
        .size()
        .reset_index(name="n")
        .sort_values(["hour", "event_type"])
        .reset_index(drop=True)
    )
    assert len(rel) == len(true)
    assert (rel["dp_count"] >= 0).all()
    # inverse-CDF Laplace from a 2^32 grid: |noise| <= ln(2^32)/eps + 1
    bound = math.log(2.0**32) / DP_EPSILON + 1.0
    raw = rel["dp_count"].to_numpy() - true["n"].to_numpy()
    # zero-clamping only ever RAISES the released value
    assert (raw >= -bound).all() and (raw <= bound).all()
    # keyed noise: a second run replays bit-for-bit
    again = (
        QUERIES["events_dp_hourly"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(["hour", "event_type"])
        .reset_index(drop=True)
    )
    assert (again["dp_count"].to_numpy() == rel["dp_count"].to_numpy()).all()


def test_rbo_weight_grid_sums_to_one():
    # identity ranking: X_d = d at every depth -> RBO_ext == 1
    from llm_map_reduce_summarizer_spark.plans.documents import (
        RBO_DEPTH,
        _RBO_EXT_W,
        _RBO_SCALE,
        _RBO_W,
    )

    ident = sum(w * (d + 1) for d, w in enumerate(_RBO_W))
    ident += _RBO_EXT_W * RBO_DEPTH
    assert abs(ident - _RBO_SCALE) <= RBO_DEPTH  # integer rounding slack


def test_rbo_bounds(spark):
    rel = QUERIES["search_rbo"](spark, SF_SMOKE).toPandas()
    assert (rel["rbo_min"] >= 0).all()
    assert (rel["rbo_ext"] >= rel["rbo_min"] - 1e-9).all()
    assert (rel["rbo_ext"] <= 1.0 + 1e-9).all()


def test_multimodal_pack_budget_invariant(spark):
    from llm_map_reduce_summarizer_spark.plans.documents import (
        MM_PACK_BUDGET_BYTES,
    )

    packed = QUERIES["multimodal_pack"](spark, SF_SMOKE).toPandas()
    per = packed.groupby(["fmt", "shard_id"]).agg(
        total=("n_bytes", "sum"), n=("doc_id", "count")
    )
    # a shard either fits the budget or is a single oversized blob
    bad = per[(per["total"] > MM_PACK_BUDGET_BYTES) & (per["n"] > 1)]
    assert bad.empty
    # shard ids are contiguous from 0 within each format stream
    for fmt, grp in packed.groupby("fmt"):
        sids = sorted(grp["shard_id"].unique())
        assert sids == list(range(len(sids)))


def test_cmh_matches_numpy(spark):
    row = QUERIES["events_cmh"](spark, SF_SMOKE).toPandas().iloc[0]
    ev = _events()
    first = ev.sort_values("ts").groupby("user_id").first()["ts"]
    purch = (
        ev[ev["event_type"] == "purchase"]
        .groupby("user_id")["ts"]
        .min()
    )
    users = pd.DataFrame({"first_ts": first})
    users["fp"] = purch
    conv = (
        users["fp"].notna()
        & ((users["fp"] - users["first_ts"]).dt.total_seconds() <= 86400)
    ).to_numpy()
    treat = np.asarray(users.index % 2 == 0)
    stratum = (users["first_ts"].dt.hour // 6).to_numpy()
    dev = var = ad = bc = 0.0
    n_strata = 0
    for s in np.unique(stratum):
        m = stratum == s
        t = m.sum()
        if t < 2:
            continue
        n_strata += 1
        a = (treat[m] & conv[m]).sum()
        n1 = treat[m].sum()
        m1 = conv[m].sum()
        dev += a - n1 * m1 / t
        var += n1 * (t - n1) * m1 * (t - m1) / (t**2 * (t - 1))
        ad += a * ((t - n1) - (m1 - a)) / t
        bc += (n1 - a) * (m1 - a) / t
    assert row["n_strata"] == n_strata
    assert _close(row["chi2_cmh"], dev * dev / var)
    assert _close(row["or_mh"], ad / bc)


def test_holt_linear_matches_numpy(spark):
    rel = (
        QUERIES["events_holt_linear"](spark, SF_SMOKE)
        .toPandas()
        .set_index("event_type")
    )
    ev = _events()
    hours = ev["ts"].dt.floor("h")
    full = pd.date_range(hours.min(), hours.max(), freq="h")
    for etype, grp in ev.groupby("event_type"):
        y = (
            grp["ts"].dt.floor("h").value_counts().reindex(full, fill_value=0)
        ).to_numpy(dtype=float)
        lev, tr = y[0], 0.0
        for t in range(1, len(y)):
            new = 0.5 * y[t] + 0.5 * (lev + tr)
            tr = 0.25 * (new - lev) + 0.75 * tr
            lev = new
        assert rel.loc[etype, "n_hours"] == len(y)
        assert _close(rel.loc[etype, "level"], lev)
        assert _close(rel.loc[etype, "forecast_next"], lev + tr)


def test_phash_hamming_neighbors_consistent(spark):
    rel = QUERIES["multimodal_phash"](spark, SF_SMOKE).toPandas()
    # recompute near-dup counts from the code census directly
    census = rel.groupby("phash").size()
    for _, r in rel.sample(n=min(25, len(rel)), random_state=7).iterrows():
        expect = sum(
            census.get(int(r["phash"]) ^ (1 << b), 0) for b in range(16)
        )
        assert r["near_dups"] == expect
    assert (rel["exact_dups"] >= 0).all()


def test_absorption_solver_analytic():
    from llm_map_reduce_summarizer_spark.plans.events import absorb_probs

    # states [a, b, purchase]: a -> b or purchase evenly, b -> a only;
    # every walk from a or b eventually purchases -> h = 1
    counts = np.array([[0, 5, 5], [7, 0, 0], [0, 0, 0]], dtype=float)
    h, ok = absorb_probs(counts, 2)
    assert ok
    assert np.allclose(h, [1.0, 1.0, 1.0], atol=1e-9)
    # c is a sink that never reaches purchase; a splits 50/50 between
    # purchase and c -> h(a) = 0.5, h(c) = 0
    counts = np.array([[0, 5, 5], [0, 9, 0], [0, 0, 0]], dtype=float)
    h, ok = absorb_probs(counts, 2)
    assert ok
    assert np.allclose(h, [0.5, 0.0, 1.0], atol=1e-9)
    # no target column observed at all -> everything 0
    h, ok = absorb_probs(np.array([[1.0]]), None)
    assert ok and h[0] == 0.0


def test_absorption_real_data_invariants(spark):
    rel = QUERIES["events_absorption"](spark, SF_SMOKE).toPandas()
    assert rel["absorb_fixed_point_ok"].all()
    assert rel["bounds_ok"].all()
    # the exact outgoing counts cross-check against pandas
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    src = ev.groupby("user_id")["event_type"].shift(1).dropna()
    assert rel.set_index("event_type")["n_out"].sum() == len(src)


def test_dp_user_total_clipping(spark):
    from llm_map_reduce_summarizer_spark.plans.events import (
        DP_USER_CLIP,
        DP_USER_EPS,
    )

    rel = (
        QUERIES["events_dp_user_total"](spark, SF_SMOKE)
        .toPandas()
        .set_index("event_type")
    )
    ev = _events()
    true = (
        ev.groupby(["user_id", "event_type"])
        .size()
        .clip(upper=DP_USER_CLIP)
        .groupby("event_type")
        .sum()
    )
    bound = DP_USER_CLIP / DP_USER_EPS * math.log(2.0**32) + 1.0
    for etype, t in true.items():
        assert abs(rel.loc[etype, "dp_total"] - t) <= bound


def test_soft_dedup_weights_sum_to_one_per_cluster(spark):
    rel = QUERIES["corpus_soft_dedup"](spark, SF_SMOKE).toPandas()
    assert (rel["weight"] <= 1.0 + 1e-9).all()
    assert (rel["weight"] > 0).all()
    # every clustered doc's weight is exactly 1/cluster_size, so each
    # cluster contributes ~1.0 total
    clustered = rel[rel["cluster_size"] > 1]
    if len(clustered):
        tot = clustered.groupby("cluster_size")["weight"].sum()
        for size, s in tot.items():
            n_clusters = len(clustered[clustered.cluster_size == size]) / size
            assert abs(s - n_clusters) < 1e-3
    # singletons keep full weight
    singles = rel[rel["cluster_size"] == 1]
    assert (singles["weight"] == 1.0).all()
    # weights never exceed a hard-dedup corpus: sum(weight) <= n_docs
    assert rel["weight"].sum() <= len(rel) + 1e-6


def test_dp_vocab_release_semantics(spark):
    from llm_map_reduce_summarizer_spark.plans.documents import (
        DP_VOCAB_CLIP,
        DP_VOCAB_EPS,
        DP_VOCAB_THRESHOLD,
    )

    rel = QUERIES["corpus_dp_vocab"](spark, SF_SMOKE).toPandas()
    assert (rel["dp_df"] >= DP_VOCAB_THRESHOLD).all()
    docs = _documents()
    # true clipped df: each doc votes for its top-CLIP terms by tf
    votes: dict[str, int] = {}
    for t in docs["text"]:
        toks = pd.Series(t.lower().strip().split())
        tf = toks.value_counts()
        top = sorted(
            tf.index, key=lambda w: (-tf[w], w)
        )[:DP_VOCAB_CLIP]
        for w in top:
            votes[w] = votes.get(w, 0) + 1
    bound = DP_VOCAB_CLIP / DP_VOCAB_EPS * math.log(2.0**32) + 1.0
    for _, r in rel.iterrows():
        true_df = votes.get(r["term"], 0)
        assert abs(r["dp_df"] - true_df) <= bound


def test_cuped_matches_numpy(spark):
    row = QUERIES["events_cuped"](spark, SF_SMOKE).toPandas().iloc[0]
    ev = _events()
    day = ev["ts"].dt.floor("D").astype("int64")
    mid = (day.min() + day.max()) / 2.0
    vq = np.floor(ev["value"].to_numpy() * 100 + 0.5)
    df = pd.DataFrame(
        {"u": ev["user_id"], "pre": np.where(day < mid, vq, 0.0),
         "post": np.where(day >= mid, vq, 0.0)}
    )
    per = df.groupby("u").sum()
    x, y = per["pre"].to_numpy(), per["post"].to_numpy()
    theta = np.cov(x, y, bias=True)[0, 1] / x.var()
    treat = np.asarray(per.index % 2 == 0)
    adj = y - theta * x
    diff_adj = adj[treat].mean() - adj[~treat].mean()
    assert _close(row["theta"], theta, tol=1e-3)
    assert _close(row["diff_adj"], diff_adj / 100.0, tol=1e-3)
    assert row["n_treat"] == int(treat.sum())


def test_semantic_dedup_survivors(spark):
    rel = QUERIES["corpus_semantic_dedup"](spark, SF_SMOKE).toPandas()
    docs = _documents()
    assert 0 < len(rel) <= len(docs)
    # survivors are a subset of the corpus and include at least one
    # member of every near-dup component (the representative)
    assert set(rel["doc_id"]).issubset(set(docs["doc_id"]))


def test_dp_median_near_true_median(spark):
    row = QUERIES["events_dp_median"](spark, SF_SMOKE).toPandas().iloc[0]
    ev = _events()
    true_bin = math.floor(ev["value"].median())
    # the exponential mechanism concentrates near the true median;
    # utility drops by >= 2 per bin of displacement so the released
    # bin lands within a generous deterministic neighborhood
    assert abs(row["dp_median_bin"] - true_bin) <= 60


def test_bootstrap_ci_brackets_point_estimate(spark):
    from llm_map_reduce_summarizer_spark.plans.events import BOOT_REPS

    row = (
        QUERIES["events_bootstrap_diff_ci"](spark, SF_SMOKE)
        .toPandas()
        .iloc[0]
    )
    assert row["n_reps"] == BOOT_REPS
    assert row["ci_lo"] <= row["ci_hi"]
    ev = _events()
    per = ev.groupby("user_id")["value"].sum()
    treat = np.asarray(per.index % 2 == 0)
    point = per[treat].mean() - per[~treat].mean()
    # the replicate mean and the CI should surround the plug-in diff
    assert row["ci_lo"] - 1.0 <= point <= row["ci_hi"] + 1.0
    assert abs(row["diff_mean"] - point) <= (
        row["ci_hi"] - row["ci_lo"]
    )


def test_msprt_trajectory_properties(spark):
    rel = (
        QUERIES["events_sequential_msprt"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("day_us")
        .reset_index(drop=True)
    )
    # counts are cumulative, the always-valid p is monotone
    # non-increasing, and both stay in their ranges
    assert rel["n_t"].is_monotonic_increasing
    assert rel["n_c"].is_monotonic_increasing
    p = rel["always_valid_p"].dropna()
    assert (p.diff().dropna() <= 1e-12).all()
    assert ((p > 0) & (p <= 1.0)).all()
    assert (rel["lambda_mixture"].dropna() > 0).all()


def test_extractive_summary_properties(spark):
    from llm_map_reduce_summarizer_spark.plans.documents import (
        SUMMARY_K_SEGMENTS,
        SUMMARY_SEG_TOKENS,
    )

    rel = QUERIES["doc_extractive_summary"](spark, SF_SMOKE).toPandas()
    docs = _documents().set_index("doc_id")
    assert len(rel) == len(docs)
    assert (rel["n_kept"] <= SUMMARY_K_SEGMENTS).all()
    assert (rel["n_kept"] <= rel["n_segments"]).all()
    for _, r in rel.sample(n=10, random_state=3).iterrows():
        toks = docs.loc[r["doc_id"], "text"].lower().strip().split()
        # the summary is made of tokens from the doc, in order, and is
        # at most k segments long
        stoks = r["summary"].split()
        assert len(stoks) <= SUMMARY_K_SEGMENTS * SUMMARY_SEG_TOKENS
        assert set(stoks).issubset(set(toks))


def test_rendezvous_minimal_movement(spark):
    from llm_map_reduce_summarizer_spark.plans.documents import HRW_SHARDS

    rel = QUERIES["corpus_shard_rendezvous"](spark, SF_SMOKE).toPandas()
    # balance: every shard within 4x of uniform at this tiny SF
    occ = rel.groupby("shard").size()
    assert occ.index.min() >= 0 and occ.index.max() < HRW_SHARDS
    # minimal movement: the scale-out moves ~1/(S+1) of docs, and the
    # moved docs are exactly those whose new-shard key wins
    frac = rel["moves_on_scale_out"].mean()
    assert 0.0 < frac < 3.0 / (HRW_SHARDS + 1)
    # determinism: assignment is a pure function of doc_id
    again = QUERIES["corpus_shard_rendezvous"](spark, SF_SMOKE).toPandas()
    merged = rel.merge(again, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["shard_a"] == merged["shard_b"]).all()


def test_qte_matches_numpy(spark):
    rel = (
        QUERIES["events_quantile_treatment_effect"](spark, SF_SMOKE)
        .toPandas()
        .set_index("q")
    )
    ev = _events()
    treat = ev["user_id"] % 2 == 0
    for q in rel.index:
        qt = np.quantile(ev.loc[treat, "value"], q)
        qc = np.quantile(ev.loc[~treat, "value"], q)
        assert _close(rel.loc[q, "qte"], qt - qc, tol=1e-3)


def test_parallel_trends_pre_mean_zero(spark):
    rel = QUERIES["events_parallel_trends"](spark, SF_SMOKE).toPandas()
    pre = rel[rel["rel_day"] < 0]
    # centered on the pre-period mean: pre residuals average to ~0
    assert abs(pre["gap_vs_pre"].mean()) < 0.05
    assert len(rel) == rel["day_us"].nunique()


def test_holt_winters_exact_on_periodic_series(spark):
    from llm_map_reduce_summarizer_spark.plans.events import (
        HW_PERIOD,
        hw_from_cells,
    )

    # a perfectly periodic series: HW locks on exactly — level stays
    # at the period mean, trend at 0, and the forecast equals the
    # true next value
    pattern = [float(3 + (k * 7) % 11) for k in range(HW_PERIOD)]
    hour0 = 1_700_000_000_000_000
    rows = [
        ("view", hour0 + t * 3_600_000_000, int(pattern[t % HW_PERIOD]))
        for t in range(HW_PERIOD * 4)
    ]
    cells = spark.createDataFrame(
        rows, "event_type string, hour_us long, cnt long"
    )
    rel = hw_from_cells(cells).toPandas().sort_values("season_slot")
    mean = sum(pattern) / HW_PERIOD
    assert len(rel) == HW_PERIOD
    assert (abs(rel["level"] - mean) < 1e-6).all()
    assert (abs(rel["trend"]) < 1e-6).all()
    n = HW_PERIOD * 4
    expected_next = pattern[n % HW_PERIOD]
    assert abs(rel["forecast_next"].iloc[0] - expected_next) < 1e-6
    for _, r in rel.iterrows():
        slot = int(r["season_slot"])
        assert abs(r["seasonal"] - (pattern[slot] - mean)) < 1e-6


def test_holt_winters_real_data_slots(spark):
    rel = QUERIES["events_holt_winters"](spark, SF_SMOKE).toPandas()
    from llm_map_reduce_summarizer_spark.plans.events import HW_PERIOD

    for etype, grp in rel.groupby("event_type"):
        assert sorted(grp["season_slot"]) == list(range(HW_PERIOD))
        assert grp["level"].nunique() == 1


def test_vad_energy_matches_numpy(spark):
    from llm_map_reduce_summarizer_spark.plans.documents import (
        VAD_FRAME_BYTES,
    )

    rel = QUERIES["multimodal_vad"](spark, SF_SMOKE).toPandas()
    docs = _documents().set_index("doc_id")
    for doc_id, grp in list(rel.groupby("doc_id"))[:10]:
        arr = np.frombuffer(
            docs.loc[doc_id, "text"].encode(), dtype=np.uint8
        ).astype(float)
        nf = (len(arr) + VAD_FRAME_BYTES - 1) // VAD_FRAME_BYTES
        assert len(grp) == nf
        g = grp.set_index("frame_idx")
        for f in range(nf):
            seg = arr[f * VAD_FRAME_BYTES : (f + 1) * VAD_FRAME_BYTES]
            e = ((seg - 128.0) ** 2).sum() / len(seg)
            assert abs(g.loc[f, "energy"] - e) < 1e-5
        # active frames exceed the doc's own mean energy
        assert (
            (g["energy"] > g["energy"].mean()) == g["active"]
        ).all()


def test_watermark_audit_measures_out_of_order(spark, tmp_path):
    """On a deliberately shuffled arrival order the audit must count
    real drops, matching an independent pandas watermark replay."""
    from llm_map_reduce_summarizer_spark.plans.events import (
        WM_ARRIVAL_BATCH,
        WM_CANDIDATE_HOURS,
    )

    rng = np.random.RandomState(11)
    n = 4000
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(
        rng.permutation(n) * 120, unit="s"
    )  # arrival (row order) is a shuffle of event time
    ev = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": ts,
            "user_id": [i % 9 for i in range(n)],
            "event_type": ["view"] * n,
            "value": [1.0] * n,
            "props": ["{}"] * n,
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")
    rel = (
        QUERIES["events_watermark_audit"](spark, str(tmp_path))
        .toPandas()
        .set_index("watermark_hours")
    )
    ab = ev["event_id"] // WM_ARRIVAL_BATCH
    ts_us = ev["ts"].astype("int64") // 1000
    mx = ts_us.groupby(ab).max()
    hw = mx.cummax().shift(1)
    late = np.maximum(
        0, ab.map(hw).fillna(ts_us.min()).to_numpy() - ts_us.to_numpy()
    )
    # with hw NaN for batch 0 -> lateness 0 (replicate the coalesce)
    late[ab.to_numpy() == 0] = 0
    for h in WM_CANDIDATE_HOURS:
        expect = int((late > h * 3_600_000_000).sum())
        assert rel.loc[h, "n_dropped"] == expect
    assert rel.loc[0, "n_dropped"] > 0  # the shuffle creates lateness


def test_anomaly_injection_eval_sane(spark):
    rel = (
        QUERIES["events_anomaly_injection_eval"](spark, SF_SMOKE)
        .toPandas()
        .set_index("min_votes")
    )
    # consensus monotonicity: stricter vote thresholds never increase
    # recall and never decrease precision (fp can only shrink)
    assert rel.loc[1, "recall"] >= rel.loc[2, "recall"] >= rel.loc[3, "recall"]
    assert (
        rel.loc[3, "fp"] <= rel.loc[2, "fp"] <= rel.loc[1, "fp"]
    )
    # the 4x+10 spikes are large: at least half get caught at votes>=1
    assert rel.loc[1, "recall"] >= 0.5
    assert (rel["tp"] + rel["fn"] == rel["n_injected"]).all()


def test_dedup_injection_recall_floor(spark):
    row = (
        QUERIES["dedup_injection_eval"](spark, SF_SMOKE)
        .toPandas()
        .iloc[0]
    )
    # J ~0.74 planted pairs through the production banded pipeline:
    # the s-curve predicts well over half get caught
    assert row["n_planted"] > 0
    assert row["recall"] >= 0.5
    assert row["n_found"] <= row["n_planted"]
    assert row["n_pairs_total"] >= row["n_found"]


def test_psi_injection_response_curve(spark):
    rel = (
        QUERIES["events_psi_injection_eval"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("shift_dollars")
        .reset_index(drop=True)
    )
    # zero shift reads exactly zero; response is monotone in shift
    assert rel.loc[0, "shift_dollars"] == 0.0
    assert rel.loc[0, "psi"] == 0.0
    assert rel["psi"].is_monotonic_increasing
    # a $25 shift on a ~$0-490 value distribution must cross the
    # industry "shifted" threshold
    assert rel.set_index("shift_dollars").loc[25.0, "psi"] > 0.25


def test_quality_injection_separation(spark):
    row = (
        QUERIES["quality_injection_eval"](spark, SF_SMOKE)
        .toPandas()
        .iloc[0]
    )
    # repeated-token junk is the easiest possible target: total catch,
    # and a clear margin over the gate's baseline strictness
    assert row["catch_rate"] == 1.0
    assert row["clean_reject_rate"] < row["catch_rate"]
    assert row["n_junk"] > 0


def test_contamination_injection_catches_leaks(spark):
    row = (
        QUERIES["contamination_injection_eval"](spark, SF_SMOKE)
        .toPandas()
        .iloc[0]
    )
    # near-verbatim benchmark leaks must ALL be flagged
    assert row["n_planted"] > 0
    assert row["catch_rate"] == 1.0
    assert row["leaks_caught"] == row["n_planted"]


def test_forecast_model_compare_sane(spark):
    rel = (
        QUERIES["events_forecast_model_compare"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert sorted(rel["model"]) == [
        "holt_linear",
        "holt_winters",
        "seasonal_naive",
        "theta",
    ]
    assert list(rel["rank"]) == [1, 2, 3, 4]
    assert rel["mae"].is_monotonic_increasing
    assert (rel["n_forecasts"] > 0).all()


def test_kn_bigram_normalization_identity(spark):
    """Interpolated Kneser–Ney must leave exactly the discount mass
    D·N1+(w1·)/c(w1), redistributed over UNSEEN continuations, per
    context: Σ_seen p_KN(·|w1) + backoff·(1 − Σ_seen p_cont) == 1.
    Recomputed from the exported exact integer columns with numpy —
    no shared code with either engine's probability expression."""
    from llm_map_reduce_summarizer_spark.plans.documents import (
        KN_DISCOUNT,
        KN_TOP,
    )

    from llm_map_reduce_summarizer_spark.plans.documents import (
        kn_bigram_counts,
        kn_from_pair_counts,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat ate the fish"),
            (3, "a dog sat on a log"),
            (4, "the dog ate the cat food"),
        ],
        ["doc_id", "text"],
    )
    out = kn_from_pair_counts(kn_bigram_counts(docs)).toPandas()
    # the identity needs the FULL bigram table — this corpus fits
    # well under the export cap by construction
    assert 0 < len(out) < KN_TOP
    n_types = len(out)
    d = KN_DISCOUNT
    for w1, g in out.groupby("w1"):
        c1 = int(g["c1"].iloc[0])
        n1p = int(g["n1plus_fwd"].iloc[0])
        assert n1p == len(g)
        assert c1 == int(g["c"].sum())
        p_cont = g["n1plus_bwd"].to_numpy() / n_types
        p_kn = (
            np.maximum(g["c"].to_numpy() - d, 0.0)
            + d * n1p * p_cont
        ) / c1
        assert np.allclose(p_kn, g["p_kn"].to_numpy(), atol=1e-6)
        backoff = d * n1p / c1
        total = p_kn.sum() + backoff * (1.0 - p_cont.sum())
        assert abs(total - 1.0) < 1e-9, (w1, total)


def test_dsir_weights_separate_target_sources(spark):
    """The DSIR estimator's whole point: documents from the target
    stratum must score higher importance weights than the raw pool
    (their n-grams inflate p_target), and the per-doc feature count
    must equal tokens + bigrams exactly."""
    from pyspark.sql import functions as F

    from llm_map_reduce_summarizer_spark.plans.documents import (
        DSIR_BUCKETS,
        dsir_is_target,
    )

    w = (
        QUERIES["corpus_dsir_weights"](spark, SF_SMOKE)
        .withColumn("tgt", dsir_is_target(F.col("source")))
        .toPandas()
    )
    docs = _documents()
    toks = docs["text"].str.strip().str.lower().str.split(r"\s+")
    n_feats_expected = toks.map(
        lambda t: len(t) + max(len(t) - 1, 0)
    )
    got = w.set_index("doc_id")["n_feats"]
    exp = pd.Series(
        n_feats_expected.values, index=docs["doc_id"].values
    )
    assert (got.sort_index() == exp.sort_index()).all()
    m_t = w.loc[w["tgt"], "log_weight"].mean()
    m_r = w.loc[~w["tgt"], "log_weight"].mean()
    assert m_t > m_r
    model = QUERIES["corpus_dsir_model"](spark, SF_SMOKE).toPandas()
    assert len(model) <= DSIR_BUCKETS
    assert int(model["n_raw"].sum()) == int(exp.sum())
    assert (model["n_raw"] >= model["n_target"]).all()


def test_cem_att_internally_consistent(spark):
    """The ATT row must be the exact fold of its matched strata: the
    treated counts add up, the counterfactual mean is the
    treated-share-weighted control mean, and pruning is non-negative
    and complete."""
    out = QUERIES["events_cem_att"](spark, SF_SMOKE).toPandas()
    att = out[out["scope"] == "att"].iloc[0]
    strata = out[out["scope"] == "stratum"]
    assert int(att["n_strata"]) == len(strata)
    assert len(strata) > 0
    assert int(att["n_treat"]) == int(strata["n_treat"].sum())
    assert int(att["n_ctrl"]) == int(strata["n_ctrl"].sum())
    assert att["pruned_treat"] >= 0 and att["pruned_ctrl"] >= 0
    cf = (
        strata["n_treat"] * strata["mean_ctrl"]
    ).sum() / strata["n_treat"].sum()
    assert _close(float(att["mean_ctrl"]), float(cf), 1e-3)
    assert _close(
        float(att["diff"]),
        float(att["mean_treat"]) - float(att["mean_ctrl"]),
        1e-3,
    )


def test_t_closeness_matches_numpy(spark):
    """Ordered-EMD recomputed from raw events for every QI group:
    t = Σ|CumP_g − CumP_all| / (B−1) over the global bin grid."""
    out = (
        QUERIES["events_t_closeness"](spark, SF_SMOKE)
        .toPandas()
        .set_index(["event_type", "hod"])
    )
    ev = _events()
    ev = ev.assign(
        hod=pd.to_datetime(ev["ts"]).dt.hour,
        vb=np.floor(ev["value"] / 10.0).astype(int),
    )
    bins = np.sort(ev["vb"].unique())
    p_all = (
        ev["vb"].value_counts().reindex(bins, fill_value=0).to_numpy()
        / len(ev)
    )
    cum_all = np.cumsum(p_all)
    for (et, hod), g in ev.groupby(["event_type", "hod"]):
        p_g = (
            g["vb"].value_counts().reindex(bins, fill_value=0).to_numpy()
            / len(g)
        )
        t = np.abs(np.cumsum(p_g) - cum_all).sum() / (len(bins) - 1)
        row = out.loc[(et, hod)]
        assert int(row["n_rows"]) == len(g)
        assert int(row["n_bins_global"]) == len(bins)
        assert _close(float(row["t_emd"]), t, 1e-4), (et, hod)


def test_interrupted_ts_matches_numpy(spark):
    """Segmented regression recomputed with np.polyfit per side."""
    row = (
        QUERIES["events_interrupted_ts"](spark, SF_SMOKE)
        .toPandas()
        .iloc[0]
    )
    ev = _events()
    hourly = ev.set_index("ts").resample("1h")["event_id"].count()
    hourly = hourly[hourly > 0]
    k = (
        (hourly.index - hourly.index.min())
        / pd.Timedelta(hours=1)
    ).astype(int)
    kc = int(k.max() // 2)
    x = (k - kc).to_numpy(float)
    y = hourly.to_numpy(float)
    pre, post = x < 0, x >= 0
    sp, lp = np.polyfit(x[pre], y[pre], 1)
    ss, ls = np.polyfit(x[post], y[post], 1)
    assert int(row["n_pre_hours"]) == int(pre.sum())
    assert int(row["n_post_hours"]) == int(post.sum())
    assert _close(float(row["slope_pre"]), sp, 1e-3)
    assert _close(float(row["slope_post"]), ss, 1e-3)
    assert _close(float(row["level_pre_at_cut"]), lp, 1e-3)
    assert _close(float(row["level_post_at_cut"]), ls, 1e-3)
    assert _close(
        float(row["level_jump"]), ls - lp, 1e-3
    )


def test_iv_wald_identity(spark):
    """Wald = ITT / first-stage exactly when the instrument clears
    the weak fence; the arms partition the user population."""
    row = QUERIES["events_iv_wald"](spark, SF_SMOKE).toPandas().iloc[0]
    ev = _events()
    assert int(row["n_z1"]) + int(row["n_z0"]) == ev["user_id"].nunique()
    if not row["weak_instrument"]:
        assert _close(
            float(row["wald_late"]),
            float(row["itt"]) / float(row["first_stage"]),
            2e-3,
        )


def test_burrows_delta_invariants(spark):
    """Delta over every unordered source pair: non-negative, one row
    per pair, and recomputed in numpy from raw tokens."""
    out = QUERIES["corpus_burrows_delta"](spark, SF_SMOKE).toPandas()
    d = _documents()
    toks = (
        d.assign(term=d["text"].str.strip().str.lower().str.split(r"\s+"))
        .explode("term")
    )
    st = toks.groupby(["source", "term"]).size().rename("n").reset_index()
    srcs = sorted(st["source"].unique())
    S = len(srcs)
    assert len(out) == S * (S - 1) // 2
    assert (out["delta"] >= 0).all()
    top = (
        st.groupby("term")["n"]
        .sum()
        .reset_index()
        .sort_values(["n", "term"], ascending=[False, True])
        .head(50)["term"]
        .tolist()
    )
    tot = st.groupby("source")["n"].sum()
    # K=50 columns even when the vocabulary is smaller: the op's
    # Delta normalizes by the PANEL size, and absent panel slots are
    # all-zero columns (sd=0 → z=0) in both formulations
    f = np.zeros((S, 50))
    idx = {s: i for i, s in enumerate(srcs)}
    sub = st[st["term"].isin(top)]
    tpos = {t: j for j, t in enumerate(top)}
    for _, r in sub.iterrows():
        f[idx[r["source"]], tpos[r["term"]]] = np.floor(
            r["n"] / tot[r["source"]] * 1e9
        )
    mu = f.mean(0)
    sd = f.std(0)
    z = np.where(sd > 0, (f - mu) / np.where(sd > 0, sd, 1.0), 0.0)
    for _, r in out.iterrows():
        expect = np.abs(
            z[idx[r["source_a"]]] - z[idx[r["source_b"]]]
        ).mean()
        assert _close(float(r["delta"]), expect, 1e-3), (
            r["source_a"],
            r["source_b"],
        )


def test_contrastive_pairs_invariants(spark):
    """Triplet sanity: negatives are always distinct from both
    anchor and positive, in-range, and positives carry the LSH
    verification score."""
    out = QUERIES["corpus_contrastive_pairs"](spark, SF_SMOKE).toPandas()
    assert len(out) > 0
    assert (out["negative_id"] != out["anchor_id"]).all()
    assert (out["negative_id"] != out["positive_id"]).all()
    n = len(_documents())
    assert out["negative_id"].between(0, n - 1).all()
    assert (out["pos_jaccard"] > 0).all()


def test_contrastive_pairs_two_doc_corpus_null_negative(spark, tmp_path):
    """Degenerate-corpus parity for the NULL-negative contract
    (VERDICT r7 item 7): a 2-doc corpus has no valid negative (both
    ids ARE the pair), so Spark AND the DuckDB oracle must emit the
    pair with negative_id NULL — the guard itself is parity-checked,
    not just unit-pinned on one engine."""
    import duckdb
    import pandas as pd

    from .oracle_utils import compare_frames

    text = (
        "the quick brown fox jumps over the lazy dog and then "
        "keeps on running across the wide open field all day"
    )
    docs = pd.DataFrame(
        [
            dict(doc_id=0, text=text, lang="en", source="s",
                 n_chars=len(text)),
            dict(doc_id=1, text=text, lang="en", source="s",
                 n_chars=len(text)),
        ]
    )
    docs.to_parquet(tmp_path / "documents.parquet")

    spark_pdf = QUERIES["corpus_contrastive_pairs"](
        spark, str(tmp_path)
    ).toPandas()
    assert len(spark_pdf) >= 1
    assert spark_pdf["negative_id"].isna().all()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path / 'documents.parquet'}'"
    )
    oracle_pdf = con.execute(
        entrymod.oracle_sql()["corpus_contrastive_pairs"]
    ).df()
    con.close()
    assert compare_frames(spark_pdf, oracle_pdf) == []


def test_t_closeness_single_bin_grid_reports_zero(spark):
    """Advisor r6: a value grid that collapses to ONE global bin must
    report t = 0 / no breach (every group's distribution trivially
    equals the global one), not a silent NULL verdict."""
    from pyspark.sql import functions as F

    from llm_map_reduce_summarizer_spark.plans.events import (
        t_closeness_cells,
        t_closeness_from_cells,
    )

    ev = spark.createDataFrame(
        [
            ("click", "2024-01-01 03:00:00", 5.0),
            ("click", "2024-01-01 03:30:00", 7.0),
            ("view", "2024-01-01 04:00:00", 3.0),
        ],
        "event_type string, ts_s string, value double",
    ).select("event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    out = t_closeness_from_cells(t_closeness_cells(ev)).toPandas()
    assert (out["n_bins_global"] == 1).all()
    assert (out["t_emd"] == 0.0).all()
    assert (~out["breach"]).all()


def test_bpe_census_nonoverlap_runs(spark):
    """The greedy non-overlap rule: a same-char run of length R
    yields floor(R/2) merge occurrences (not R−1); non-self pairs
    count every position."""
    from llm_map_reduce_summarizer_spark.plans.documents import (
        bpe_census_from_term_counts,
    )

    tfdf = spark.createDataFrame(
        [("aaaa", 1), ("abab", 2), ("aaabbb", 1)], ["term", "tf"]
    )
    out = (
        bpe_census_from_term_counts(tfdf)
        .toPandas()
        .set_index("pair")["n_occurrences"]
        .to_dict()
    )
    assert out == {"aa": 3, "ab": 5, "ba": 2, "bb": 1}


def test_markov_removal_effects_analytic():
    """Analytic chains pin the removal-effect solver: a channel on
    the only converting path owns ALL the credit; a channel that
    never reaches conversion gets none; a 50/50 split shares it."""
    from llm_map_reduce_summarizer_spark.plans.events import (
        markov_removal_effects,
    )

    # START -> A -> purchase (1 user); START -> B -> END (1 user)
    cells = [
        ("START", "A", 1),
        ("A", "purchase", 1),
        ("START", "B", 1),
        ("B", "END", 1),
    ]
    ch, base, res, shares, n_in, n_out, ok = markov_removal_effects(
        cells
    )
    assert ok and sorted(ch) == ["A", "B"]
    assert abs(base - 0.5) < 1e-9
    assert abs(res["A"] - 1.0) < 1e-9 and abs(res["B"]) < 1e-9
    assert abs(shares["A"] - 1.0) < 1e-9
    assert n_in == {"A": 1, "B": 1} and n_out == {"A": 1, "B": 1}

    # two symmetric converting channels split the credit evenly
    cells = [
        ("START", "A", 1),
        ("A", "purchase", 1),
        ("START", "B", 1),
        ("B", "purchase", 1),
    ]
    _, base, res, shares, _, _, ok = markov_removal_effects(cells)
    assert ok and abs(base - 1.0) < 1e-9
    assert abs(shares["A"] - 0.5) < 1e-9
    assert abs(shares["B"] - 0.5) < 1e-9
    assert abs(res["A"] - 0.5) < 1e-9


def test_markov_unreachable_channel_raises(spark):
    """The solver_converged invariant is structural and now COMPUTED
    on both engines (r8): a channel cycle with no path to an
    absorbing state (here A<->B, never reaching purchase or END) must
    make attribution_markov_from_pairs raise — the oracle's
    recursive-CTE reachability boolean would read FALSE on the same
    data, so the two sides scream together instead of hash-diverging."""
    from llm_map_reduce_summarizer_spark.plans.events import (
        attribution_markov_from_pairs,
    )

    import pytest

    pairs = spark.createDataFrame(
        [
            ("START", "A", 1),
            ("A", "B", 1),
            ("B", "A", 1),
            ("START", "purchase", 1),
        ],
        "src string, dst string, n long",
    )
    with pytest.raises(ValueError, match="reaches_absorbing=False"):
        attribution_markov_from_pairs(pairs)


def test_multimodal_neardup_banded_subset_and_topk(spark):
    """The banded tier's contract vs the exact tier: every emitted
    pair is a TRUE exact-tier pair with the identical quantized
    cosine (banding only restricts candidates — it must never invent
    a hit or move a score), and the per-doc top-k output bound holds
    with rk dense from 1 in (cos desc, db asc) order."""
    from llm_map_reduce_summarizer_spark.plans.documents import (
        MM_BANDED_TOPK,
    )

    exact = QUERIES["multimodal_neardup"](spark, SF_SMOKE).toPandas()
    truth = {}
    for r in exact.itertuples():
        truth[(r.da, r.db)] = r.cos
        truth[(r.db, r.da)] = r.cos
    banded = QUERIES["multimodal_neardup_banded"](
        spark, SF_SMOKE
    ).toPandas()
    assert len(banded) > 0  # the smoke corpus has near-dup structure
    for r in banded.itertuples():
        assert (r.da, r.db) in truth
        assert abs(truth[(r.da, r.db)] - r.cos) < 1e-12
    per = banded.groupby("da")
    assert int(per.size().max()) <= MM_BANDED_TOPK
    for _, grp in per:
        g = grp.sort_values("rk")
        assert list(g["rk"]) == list(range(1, len(g) + 1))
        ranked = g.sort_values(
            ["cos", "db"], ascending=[False, True]
        )
        assert list(ranked["rk"]) == list(g["rk"])
