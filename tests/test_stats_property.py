"""Hypothesis property tests for the inferential-statistics tier.

The sf0.001 pins (test_stats.py) check one fixed corpus; these drive
RANDOM micro-corpora — heavy ties, tiny groups, degenerate variances —
through the Spark operators and compare against independent
numpy/pandas formulas, so edge cases the fixed corpus never exercises
(guard branches, all-tied ranks, single-member strata) are covered.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # randomized armor — excluded from the driver's timed gate
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)


def _close(a, b, tol=1e-3):
    return abs(a - b) <= tol * max(1.0, abs(a), abs(b))


def _write_events(tmp, df):
    df.to_parquet(tmp / "events.parquet")
    return str(tmp)


@pytest.mark.parametrize("seed", [0])
def test_events_stats_random(spark, tmp_path_factory, seed):
    @settings(**_SETTINGS)
    @given(data=st.data())
    def run(data):
        n = data.draw(st.integers(30, 120))
        types = data.draw(
            st.sampled_from(
                [
                    ["purchase", "click"],
                    ["purchase", "click", "error"],
                    ["purchase", "click", "view", "signup"],
                ]
            )
        )
        # cent-grid values with deliberate tie mass
        vals = data.draw(
            st.lists(
                st.integers(0, 40), min_size=n, max_size=n
            )
        )
        tlist = data.draw(
            st.lists(
                st.sampled_from(types), min_size=n, max_size=n
            )
        )
        hours = data.draw(
            st.lists(st.integers(0, 71), min_size=n, max_size=n)
        )
        ev = pd.DataFrame(
            {
                "event_id": range(n),
                "ts": pd.Timestamp("2024-03-01")
                + pd.to_timedelta(hours, unit="h")
                + pd.to_timedelta(range(n), unit="s"),
                "user_id": [i % 7 for i in range(n)],
                "event_type": tlist,
                "value": [v / 100.0 * 25 for v in vals],  # cent grid
                "props": ["{}"] * n,
            }
        )
        tmp = tmp_path_factory.mktemp("evp")
        sf = _write_events(tmp, ev)

        # --- Welch ---
        row = QUERIES["events_ab_welch"](spark, sf).toPandas().iloc[0]
        a = ev.loc[ev.event_type == "purchase", "value"].to_numpy()
        b = ev.loc[ev.event_type == "click", "value"].to_numpy()
        na, nb = len(a), len(b)
        assert row["n_a"] == na and row["n_b"] == nb
        if na > 1 and nb > 1:
            va, vb = a.var(ddof=1), b.var(ddof=1)
            se2 = va / na + vb / nb
            if se2 > 0:
                t = (a.mean() - b.mean()) / math.sqrt(se2)
                assert _close(row["t_stat"], t)
            else:
                assert pd.isna(row["t_stat"])
        else:
            assert pd.isna(row["t_stat"])

        # --- Mann-Kendall ---
        row = (
            QUERIES["events_mann_kendall"](spark, sf)
            .toPandas()
            .iloc[0]
        )
        hourly = (
            ev.set_index("ts").resample("1h")["event_id"].count()
        )
        x = hourly[hourly > 0].to_numpy(float)
        h = len(x)
        s = int(
            np.sign(x[None, :] - x[:, None])[
                np.triu_indices(h, 1)
            ].sum()
        )
        assert row["n_hours"] == h
        assert row["s_stat"] == s

        # --- Kruskal-Wallis ---
        row = (
            QUERIES["events_value_kruskal"](spark, sf)
            .toPandas()
            .iloc[0]
        )
        v = np.floor(ev["value"].to_numpy() * 100 + 0.5)
        r = pd.Series(v).rank(method="average").to_numpy()
        nn = len(v)
        srr = sum(
            r[ev.event_type.to_numpy() == g].sum() ** 2
            / (ev.event_type == g).sum()
            for g in ev.event_type.unique()
        )
        _, counts = np.unique(v, return_counts=True)
        corr = 1 - (counts**3 - counts).sum() / (nn**3 - nn)
        assert row["n_events"] == nn
        assert row["k_groups"] == ev.event_type.nunique()
        if corr > 0:
            hstat = (12.0 / (nn * (nn + 1)) * srr - 3 * (nn + 1)) / corr
            assert _close(row["h_stat"], hstat)

        # --- CUSUM (Page recursion, integer allowance) ---
        df = QUERIES["events_cusum"](spark, sf).toPandas()
        for et, grp in df.groupby("event_type"):
            hr = (
                ev[ev.event_type == et]
                .set_index("ts")
                .resample("1h")["event_id"]
                .count()
            )
            xs = hr[hr > 0].to_numpy(float)
            mu = xs.mean()
            sd = xs.std(ddof=1) if len(xs) > 1 else 0.0
            k = (
                math.ceil(sd / 2)
                if len(xs) > 1 and sd > 0
                else 0
            )
            acc, exp = 0.0, []
            for xx in xs:
                acc = max(0.0, acc + (xx - mu - k))
                exp.append(acc)
            got = grp.sort_values("hour")["cusum"].to_numpy(float)
            assert len(got) == len(exp)
            for gg, ee in zip(got, exp):
                assert _close(gg, ee)

        # --- conversion z-test (24h fast activation) ---
        row = (
            QUERIES["events_conversion_ztest"](spark, sf)
            .toPandas()
            .iloc[0]
        )
        first = ev.groupby("user_id")["ts"].min()
        conv = {}
        for u, grp in ev.groupby("user_id"):
            pur = grp.loc[grp.event_type == "purchase", "ts"]
            conv[u] = int(
                (pur < first[u] + pd.Timedelta(hours=24)).any()
            )
        n_a = sum(1 for u in conv if u % 2 == 0)
        x_a = sum(v for u, v in conv.items() if u % 2 == 0)
        n_b = len(conv) - n_a
        x_b = sum(conv.values()) - x_a
        assert row["n_a"] == n_a and row["x_a"] == x_a
        assert row["n_b"] == n_b and row["x_b"] == x_b
        if n_a and n_b:
            pool = (x_a + x_b) / (n_a + n_b)
            se2 = pool * (1 - pool) * (1 / n_a + 1 / n_b)
            if se2 > 0:
                z = (x_a / n_a - x_b / n_b) / math.sqrt(se2)
                assert _close(row["z_stat"], z)
            else:
                assert pd.isna(row["z_stat"])

        # --- PSI (Laplace-smoothed window halves) ---
        df = QUERIES["events_value_psi"](spark, sf).toPandas()
        ts_us = (
            ev["ts"].astype("datetime64[us]").astype("int64")
        ).to_numpy(float)
        medus = np.percentile(ts_us, 50, method="linear")
        bucket = np.floor(ev["value"].to_numpy() / 10.0).astype(int)
        bs = sorted(set(bucket))
        n1 = {b: int(((bucket == b) & (ts_us <= medus)).sum()) for b in bs}
        n2 = {b: int(((bucket == b) & (ts_us > medus)).sum()) for b in bs}
        t1, t2, nb = sum(n1.values()), sum(n2.values()), len(bs)
        psi = 0.0
        for b in bs:
            p1 = (n1[b] + 1) / (t1 + nb)
            p2 = (n2[b] + 1) / (t2 + nb)
            psi += (p2 - p1) * math.log(p2 / p1)
        assert len(df) == nb
        assert _close(df["psi_total"].iloc[0], psi)

    run()


@pytest.mark.parametrize("seed", [0])
def test_documents_stats_random(spark, tmp_path_factory, seed):
    @settings(**_SETTINGS)
    @given(data=st.data())
    def run(data):
        n = data.draw(st.integers(12, 60))
        langs = data.draw(
            st.sampled_from([["en", "fr"], ["en", "fr", "de"]])
        )
        n_src = data.draw(st.integers(2, 4))
        lang_col = data.draw(
            st.lists(st.sampled_from(langs), min_size=n, max_size=n)
        )
        src_col = data.draw(
            st.lists(
                st.integers(0, n_src - 1), min_size=n, max_size=n
            )
        )
        chars = data.draw(
            st.lists(st.integers(5, 400), min_size=n, max_size=n)
        )
        docs = pd.DataFrame(
            {
                "doc_id": range(n),
                "text": ["alpha beta gamma delta"] * n,
                "lang": lang_col,
                "source": [f"s{i}" for i in src_col],
                "n_chars": chars,
            }
        )
        tmp = tmp_path_factory.mktemp("docp")
        docs.to_parquet(tmp / "documents.parquet")
        sf = str(tmp)

        # --- ANOVA ---
        row = QUERIES["doc_anova_length"](spark, sf).toPandas().iloc[0]
        groups = [
            g.to_numpy(float)
            for _, g in docs.groupby("lang")["n_chars"]
        ]
        k = len(groups)
        assert row["n_docs"] == n and row["n_groups"] == k
        grand = np.concatenate(groups).mean()
        ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
        ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
        if k > 1 and ssw > 0:
            f = (ssb / (k - 1)) / (ssw / (n - k))
            assert _close(row["f_stat"], f)
        else:
            assert pd.isna(row["f_stat"])

        # --- chi-square ---
        row = (
            QUERIES["corpus_chi2_independence"](spark, sf)
            .toPandas()
            .iloc[0]
        )
        ct = pd.crosstab(docs["lang"], docs["source"]).to_numpy(float)
        exp = np.outer(ct.sum(1), ct.sum(0)) / ct.sum()
        chi2 = ((ct - exp) ** 2 / exp).sum()
        assert row["n_docs"] == n
        assert row["dof"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
        assert _close(row["chi2"], chi2)

    run()


@pytest.mark.parametrize("seed", [0])
def test_events_profile_random(spark, tmp_path_factory, seed):
    """Random micro-corpora through the traffic-shape tier: peak
    detection, hour-of-day concentration, and the l-diversity screen —
    pandas/numpy mirrors, heavy ties and single-hour types included."""

    @settings(**_SETTINGS)
    @given(data=st.data())
    def run(data):
        n = data.draw(st.integers(30, 120))
        types = data.draw(
            st.sampled_from(
                [["purchase", "click"], ["purchase", "click", "error"]]
            )
        )
        tlist = data.draw(
            st.lists(st.sampled_from(types), min_size=n, max_size=n)
        )
        hours = data.draw(
            st.lists(st.integers(0, 71), min_size=n, max_size=n)
        )
        vals = data.draw(
            st.lists(st.integers(0, 40), min_size=n, max_size=n)
        )
        ev = pd.DataFrame(
            {
                "event_id": range(n),
                "ts": pd.Timestamp("2024-03-01")
                + pd.to_timedelta(hours, unit="h")
                + pd.to_timedelta(range(n), unit="s"),
                "user_id": [i % 7 for i in range(n)],
                "event_type": tlist,
                "value": [v / 100.0 * 25 for v in vals],
                "props": ["{}"] * n,
            }
        )
        tmp = tmp_path_factory.mktemp("evs")
        sf = _write_events(tmp, ev)

        # --- peak hours: strict local max over OBSERVED hours + 2σ ---
        df = QUERIES["events_peak_hours"](spark, sf).toPandas()
        expect = set()
        for et in set(tlist):
            hr = (
                ev[ev.event_type == et]
                .set_index("ts")
                .resample("1h")["event_id"]
                .count()
            )
            hr = hr[hr > 0]
            xs = hr.to_numpy(float)
            h = len(xs)
            if h < 2:
                continue
            mu, sd = xs.mean(), xs.std(ddof=1)
            if sd == 0:
                continue
            for i in range(1, h - 1):
                z = (xs[i] - mu) / sd
                if xs[i] > xs[i - 1] and xs[i] > xs[i + 1] and z >= 2.0:
                    expect.add((et, hr.index[i]))
                    got = df[
                        (df.event_type == et) & (df.hour == hr.index[i])
                    ]
                    assert len(got) == 1
                    assert _close(got["zscore"].iloc[0], z, tol=1e-3)
        assert (
            set(zip(df.event_type, df.hour)) == expect
        )

        # --- hour concentration: entropy + deterministic argmax ---
        df = (
            QUERIES["events_hour_concentration"](spark, sf)
            .toPandas()
            .set_index("event_type")
        )
        for et in set(tlist):
            hod = ev.loc[ev.event_type == et, "ts"].dt.hour
            cnt = hod.value_counts()
            total = cnt.sum()
            p = cnt.to_numpy(float) / total
            ent = float(-(p * np.log2(p)).sum())
            peak = min(
                cnt.index[cnt == cnt.max()]
            )  # ties -> earliest hour
            row = df.loc[et]
            assert row["active_hods"] == len(cnt)
            assert row["peak_hod"] == peak
            assert _close(row["peak_share"], cnt.max() / total)
            assert _close(row["hod_entropy"], ent)

        # --- l-diversity over the QI cells ---
        row = QUERIES["events_l_diversity"](spark, sf).toPandas().iloc[0]
        cells = ev.assign(
            hod=ev["ts"].dt.hour,
            vb=np.floor(ev["value"] / 10.0).astype(int),
        ).groupby(["event_type", "hod", "vb"])["user_id"]
        g = cells.size()
        l = cells.nunique()
        assert row["n_rows"] == n
        assert row["n_groups"] == len(g)
        assert row["min_diversity"] == int(l.min())
        assert row["n_low_diversity_groups"] == int((l < 3).sum())
        assert row["rows_at_risk"] == int(g[l < 3].sum())

    run()


@pytest.mark.parametrize("seed", [0])
def test_growth_and_funnel_random(spark, tmp_path_factory, seed):
    """Random micro-corpora through the growth ledger and the windowed
    funnel — pandas mirrors of the day-classification and the
    chain-in-window existence semantics."""

    @settings(**_SETTINGS)
    @given(data=st.data())
    def run(data):
        n = data.draw(st.integers(20, 80))
        days = data.draw(
            st.lists(st.integers(0, 9), min_size=n, max_size=n)
        )
        secs = data.draw(
            st.lists(st.integers(0, 86399), min_size=n, max_size=n)
        )
        types = data.draw(
            st.lists(
                st.sampled_from(["view", "click", "purchase"]),
                min_size=n,
                max_size=n,
            )
        )
        ev = pd.DataFrame(
            {
                "event_id": range(n),
                "ts": pd.Timestamp("2024-03-01")
                + pd.to_timedelta(days, unit="D")
                + pd.to_timedelta(secs, unit="s"),
                "user_id": [i % 5 for i in range(n)],
                "event_type": types,
                "value": [0.0] * n,
                "props": ["{}"] * n,
            }
        )
        tmp = tmp_path_factory.mktemp("gf")
        sf = _write_events(tmp, ev)

        # --- growth accounting ---
        df = (
            QUERIES["events_growth_accounting"](spark, sf)
            .toPandas()
            .set_index("day")
            .sort_index()
        )
        act = ev.assign(day=ev["ts"].dt.normalize())
        user_days = {
            u: sorted(set(g["day"])) for u, g in act.groupby("user_id")
        }
        max_day = act["day"].max()
        one = pd.Timedelta(days=1)
        exp = {}
        for u, ds in user_days.items():
            for i, d in enumerate(ds):
                e = exp.setdefault(
                    d, dict(dau=0, new=0, ret=0, res=0, churn=0)
                )
                e["dau"] += 1
                if i == 0:
                    e["new"] += 1
                elif ds[i - 1] == d - one:
                    e["ret"] += 1
                else:
                    e["res"] += 1
                nxt = ds[i + 1] if i + 1 < len(ds) else None
                if (nxt is None and d < max_day) or (
                    nxt is not None and nxt > d + one
                ):
                    exp.setdefault(
                        d + one, dict(dau=0, new=0, ret=0, res=0, churn=0)
                    )["churn"] += 1
        assert set(df.index) == set(exp)
        for d, e in exp.items():
            row = df.loc[d]
            assert row["dau"] == e["dau"]
            assert row["n_new"] == e["new"]
            assert row["n_retained"] == e["ret"]
            assert row["n_resurrected"] == e["res"]
            assert row["n_churned"] == e["churn"]

        # --- windowed funnel ---
        row = (
            QUERIES["events_window_funnel"](spark, sf).toPandas().iloc[0]
        )
        W = pd.Timedelta(hours=6)
        l1 = l2 = l3 = 0
        for u, g in ev.groupby("user_id"):
            vs = g.loc[g.event_type == "view", "ts"]
            cs = g.loc[g.event_type == "click", "ts"]
            ps = g.loc[g.event_type == "purchase", "ts"]
            if len(vs) == 0:
                continue
            l1 += 1
            got2 = any(
                ((cs > v) & (cs <= v + W)).any() for v in vs
            )
            if got2:
                l2 += 1
            got3 = any(
                ((cs > v) & (cs <= v + W) & (cs < p)).any()
                and (p <= v + W)
                for v in vs
                for p in ps
            )
            if got3:
                l3 += 1
        assert row["n_level1"] == l1
        assert row["n_level2"] == l2
        assert row["n_level3"] == l3

    run()


@pytest.mark.parametrize("seed", [0])
def test_causal_tier_random(spark, tmp_path_factory, seed):
    """Random micro-corpora through the causal/robust tier: DiD and
    CUPED against independent pandas formulas, QTE against numpy
    quantiles — degenerate arms and tiny periods included."""

    @settings(**_SETTINGS)
    @given(data=st.data())
    def run(data):
        n = data.draw(st.integers(40, 120))
        vals = data.draw(
            st.lists(st.integers(0, 40), min_size=n, max_size=n)
        )
        days = data.draw(
            st.lists(st.integers(0, 5), min_size=n, max_size=n)
        )
        users = data.draw(
            st.lists(st.integers(0, 9), min_size=n, max_size=n)
        )
        ev = pd.DataFrame(
            {
                "event_id": range(n),
                "ts": pd.Timestamp("2024-03-01")
                + pd.to_timedelta(days, unit="D")
                + pd.to_timedelta(range(n), unit="s"),
                "user_id": users,
                "event_type": ["view"] * n,
                "value": [v / 100.0 * 25 for v in vals],
                "props": ["{}"] * n,
            }
        )
        tmp = tmp_path_factory.mktemp("evc")
        sf = _write_events(tmp, ev)

        vq = np.floor(ev["value"].to_numpy() * 100 + 0.5)
        treat = (ev["user_id"] % 2 == 0).to_numpy()

        # --- DiD ---
        row = QUERIES["events_diff_in_diff"](spark, sf).toPandas().iloc[0]
        hour = (
            ev["ts"].dt.floor("h").astype("int64") // 1000
        ).to_numpy()
        mid = (hour.min() + hour.max()) / 2.0
        post = hour >= mid
        arms = {
            "tp": vq[treat & post],
            "tc": vq[treat & ~post],
            "cp": vq[~treat & post],
            "cc": vq[~treat & ~post],
        }
        assert row["n_treat_post"] == len(arms["tp"])
        if all(len(a) > 1 for a in arms.values()):
            did = (arms["tp"].mean() - arms["tc"].mean()) - (
                arms["cp"].mean() - arms["cc"].mean()
            )
            assert _close(row["did_estimate"], did / 100.0)
            se2 = sum(a.var(ddof=1) / len(a) for a in arms.values())
            if se2 > 0:
                assert _close(row["t_stat"], did / math.sqrt(se2))
        else:
            assert pd.isna(row["t_stat"])

        # --- CUPED ---
        row = QUERIES["events_cuped"](spark, sf).toPandas().iloc[0]
        day = (ev["ts"].dt.floor("D").astype("int64") // 1000).to_numpy()
        dmid = (day.min() + day.max()) / 2.0
        per = pd.DataFrame(
            {
                "u": ev["user_id"],
                "x": np.where(day < dmid, vq, 0.0),
                "y": np.where(day >= dmid, vq, 0.0),
            }
        ).groupby("u").sum()
        x, y = per["x"].to_numpy(), per["y"].to_numpy()
        tmask = np.asarray(per.index % 2 == 0)
        assert row["n_treat"] == int(tmask.sum())
        if x.var() > 0 and tmask.sum() > 1 and (~tmask).sum() > 1:
            theta = np.cov(x, y, bias=True)[0, 1] / x.var()
            adj = y - theta * x
            diff = adj[tmask].mean() - adj[~tmask].mean()
            assert _close(row["theta"], theta)
            assert _close(row["diff_adj"], diff / 100.0)
        else:
            assert pd.isna(row["theta"])

        # --- QTE ---
        rel = (
            QUERIES["events_quantile_treatment_effect"](spark, sf)
            .toPandas()
            .set_index("q")
        )
        if treat.sum() > 0 and (~treat).sum() > 0:
            for q in rel.index:
                qt = np.quantile(ev.loc[treat, "value"], q)
                qc = np.quantile(ev.loc[~treat, "value"], q)
                assert _close(rel.loc[q, "qte"], qt - qc)

    run()


@pytest.mark.parametrize("seed", [0])
def test_forecast_and_dp_random(spark, tmp_path_factory, seed):
    """Random sparse hourly series through Holt-linear (vs an
    independent recurrence) and the DP hourly release (noise bound +
    determinism) — gap-heavy calendars the fixed corpus never has."""

    @settings(**_SETTINGS)
    @given(data=st.data())
    def run(data):
        n = data.draw(st.integers(30, 90))
        hours = data.draw(
            st.lists(st.integers(0, 47), min_size=n, max_size=n)
        )
        types = data.draw(
            st.lists(
                st.sampled_from(["view", "click"]),
                min_size=n,
                max_size=n,
            )
        )
        ev = pd.DataFrame(
            {
                "event_id": range(n),
                "ts": pd.Timestamp("2024-03-01")
                + pd.to_timedelta(hours, unit="h"),
                "user_id": [i % 5 for i in range(n)],
                "event_type": types,
                "value": [1.0] * n,
                "props": ["{}"] * n,
            }
        )
        tmp = tmp_path_factory.mktemp("evf")
        sf = _write_events(tmp, ev)

        # --- Holt linear vs independent recurrence ---
        rel = (
            QUERIES["events_holt_linear"](spark, sf)
            .toPandas()
            .set_index("event_type")
        )
        lo = ev["ts"].dt.floor("h").min()
        hi = ev["ts"].dt.floor("h").max()
        full = pd.date_range(lo, hi, freq="h")
        for etype in ev["event_type"].unique():
            y = (
                ev.loc[ev.event_type == etype, "ts"]
                .dt.floor("h")
                .value_counts()
                .reindex(full, fill_value=0)
                .to_numpy(dtype=float)
            )
            lev, tr = y[0], 0.0
            for t in range(1, len(y)):
                new = 0.5 * y[t] + 0.5 * (lev + tr)
                tr = 0.25 * (new - lev) + 0.75 * tr
                lev = new
            assert rel.loc[etype, "n_hours"] == len(y)
            assert _close(rel.loc[etype, "forecast_next"], lev + tr)

        # --- DP hourly: bounded noise, deterministic replay ---
        dp = (
            QUERIES["events_dp_hourly"](spark, sf)
            .toPandas()
            .sort_values(["hour", "event_type"])
            .reset_index(drop=True)
        )
        true = (
            ev.assign(hour=ev["ts"].dt.floor("h"))
            .groupby(["hour", "event_type"])
            .size()
            .reset_index(name="tn")
            .sort_values(["hour", "event_type"])
            .reset_index(drop=True)
        )
        assert len(dp) == len(true)
        bound = math.log(2.0**32) + 1.0
        assert (dp["dp_count"] >= 0).all()
        assert (
            (dp["dp_count"] - true["tn"]).abs() <= bound
        ).all()
        again = (
            QUERIES["events_dp_hourly"](spark, sf)
            .toPandas()
            .sort_values(["hour", "event_type"])
            .reset_index(drop=True)
        )
        assert (
            again["dp_count"].to_numpy() == dp["dp_count"].to_numpy()
        ).all()

    run()
