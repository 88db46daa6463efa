#!/usr/bin/env python3
"""Deterministic sf-scaled testdata generator (dev tooling, NOT library code).

Usage: python3 tools/gen_sf.py <sf> <outDir> [--effect]
       e.g. gen_sf.py 1 testdata/sf1

--effect plants KNOWN effects the statistical-inference lanes must
DETECT (the c43 planted-drift discipline applied to the inference
block — on the default uniform/independent data q116/q118/q119 are
structurally null, so their detection path never fires):

  orders     AUTOMOBILE customers' post-1997-01-01 totalprice ×1.15
             (q119 DiD must read significant=1; q120's placebo stays
             inside the pre-period and must stay null)
  lineitem   lines with l_discount >= 0.05 redraw l_returnflag with
             p(R)=0.40 vs the 1/3 baseline (q116 odds ratio ~1.33,
             CI excludes 1)
  events     event_type redrawn with purchase share 0.24 / view 0.16
             (purchase fraction among view+purchase = 0.6 > 0.52, so
             q118's SPRT must cross accept_h1)

Round-15 additions (the DETECTOR block: q55/s22, q90, q91, q104, q53,
s18, q69 had never fired either). All are DETERMINISTIC transforms —
zero extra rng draws, so the r14 planted streams are bit-unchanged:

  orders     ×(1 + 0.5·day/2404) linear drift over the order-date axis
             (q91 Mann-Kendall must read "increasing"; the drift is
             common to both DiD groups so q119 stays significant and
             q120's placebo difference still cancels), and every
             custkey ≡ 0 (mod 59) collapses to 2% spend (planted MAD
             outliers for q53 — low side, so variance is not inflated)
  lineitem   H2-1996 shipments (days 546..729 of the 1995-01-02 axis)
             triple extendedprice — q104's 1996 sign sequence clusters
             below-then-above the year median (too few runs)
  events     purchase values shift +50 vs the view distribution (q90's
             KS must reject); an order-preserving piecewise TIME WARP
             squeezes original days 12..15 into [day12, day12+2h] (a
             12x rate spike — q69 STL and s18 z-score must flag it)
             and plays original days 22..30 at 1.5x rate (a sustained
             level shift — q55/s22 CUSUM's max-|cusum| day must land
             at the day-11/12 boundary, the largest level break)

Replicates the driver-generated tables' observed schema and distributions
(studied from /root/testdata/sf0.001-0.1) at a larger scale factor, so the
CORRECTNESS protocol and bench can be exercised beyond sf0.1. The protocol
is self-consistent (Spark and DuckDB read the SAME parquet), so exact
driver-RNG reproduction is not required — but every distribution shape the
operators' constants depend on is preserved:

  region/nation     fixed 5/25 rows (TPC-H style)
  customer          sf*150k, acctbal U(-1000,10000) 2dp, 5 mktsegments,
                    nationkey U(0,24), name Customer#%09d
  supplier          sf*10k, same style
  part              sf*200k, name adj+noun (8x8), Brand#1..25, 6 types,
                    size U(1,50), retailprice = 900 + (partkey % 1000)/10
  orders            sf*1.5M, status/priority uniform, totalprice
                    U(1000,500000) 2dp, orderdate day-uniform 1995..2001-08
  lineitem          Poisson(4) lines per order (mean 4 => ~sf*6M),
                    partkey/suppkey uniform, qty U{1..50}, extendedprice
                    U(900,105000) 2dp, discount {0..0.10}, tax {0..0.08},
                    returnflag A/N/R, linestatus O/F, shipdate day-uniform
                    1995-01-02..2001-11-04 (independent of orderdate)
  events            sf*1M rows over a FIXED 30-day window starting
                    2024-01-01 (gap mean scales down), event_id = arrival
                    order, user_id U(0, customers/10), 5 event types,
                    value Exp(50) 2dp, props {"k": U(0,99)}
  documents         sf*50k word-salad docs (30-word vocab, 10..100 tokens),
                    lang en 40%/others 15%, source src0..19; 5% of docs are
                    a copy of another doc + " dup" (the planted near-dup
                    structure d01/d02/d03/d06/d08 exercise; jaccard vs the
                    base ~0.9 > the 0.8 threshold)
  embeddings        4*sf*2k unit-normalized 64-dim float vectors,
                    label U(0,9) (no cluster structure, like the original)

Row-group layout (r13): row groups are ATOMIC scan units — Spark's
maxPartitionBytes cannot split inside one, so scan parallelism on a
single-file table equals its row-group count (the round-12 d18 sf5>sf10
inversion root cause). Every table therefore writes AT LEAST 32 row
groups (rows/32, floor 1) capped at a per-table row count that keeps
groups ≲16 MB, so local scans parallelize like a real multi-file corpus
at every sf. Content is unchanged — layout only, generator stays
deterministic (same SEED, same RNG call order).
"""
import sys, os, json
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 4242

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = ["ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
           "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ",
           "JAPAN", "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU",
           "CHINA", "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA",
           "UNITED KINGDOM", "UNITED STATES"]
MKTSEG = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPE = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
OSTATUS = ["O", "F", "P"]
OPRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "customer", "sort", "order", "slow", "line", "part", "fast", "the",
         "row", "agg", "key", "query", "a", "scan", "batch"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANGW = [0.40, 0.15, 0.15, 0.15, 0.15]

DAY_US = 86_400_000_000


def rg_rows(n_rows, cap_rows):
    """Row-group size: >=32 groups per table (the local[32] scan-
    parallelism floor — 8 groups left sf5 documents scanning 8-wide
    while sf10's 16 groups ran 16-wide, reproducing the inversion the
    layout exists to kill), capped so groups stay <=16 MB for the wide
    tables."""
    return max(1, min(cap_rows, -(-n_rows // 32)))


def write(outdir, name, table, cap_rows):
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"),
                   row_group_size=rg_rows(table.num_rows, cap_rows),
                   compression="snappy")
    print(f"  {name}: {table.num_rows} rows")


def ts_ms(us):
    # round-8 driver regeneration: orders/lineitem dates are
    # TIMESTAMP(MICROS, isAdjustedToUTC=false) (rounds 1-7: ms). Keep
    # ms-truncated VALUES (the generator's date math is day-granular
    # anyway) but write the driver's current physical type.
    return pa.array((np.asarray(us, dtype=np.int64) // 1000) * 1000,
                    pa.timestamp("us"))


def ts_ns(us):
    # round-8 driver regeneration: events.ts is TIMESTAMP(MICROS,
    # isAdjustedToUTC=false) (rounds 1-7: TIMESTAMP(NANOS));
    # graft.Tables.normalizeEventsTs adapts to either physical type.
    return pa.array(np.asarray(us, dtype=np.int64), pa.timestamp("us"))


def main():
    sf = float(sys.argv[1])
    outdir = sys.argv[2]
    effect = "--effect" in sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(SEED)

    n_cust = int(sf * 150_000)
    n_supp = int(sf * 10_000)
    n_part = int(sf * 200_000)
    n_ord = int(sf * 1_500_000)
    n_ev = int(sf * 1_000_000)
    n_doc = int(sf * 50_000)
    n_emb = int(sf * 8_000)

    write(outdir, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(REGIONS)}), 5)
    write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array(NATIONS),
        "n_regionkey": pa.array(np.arange(25, dtype=np.int32) % 5)}), 25)

    # effect mode may add EXTRA rng draws but never reorders the default
    # path's calls — same seed, same default output as every prior round
    ck = np.arange(n_cust, dtype=np.int64)
    c_nationkey = rng.integers(0, 25, n_cust).astype(np.int32)
    c_acctbal = np.round(rng.uniform(-1000, 10000, n_cust), 2)
    cust_seg = np.array(MKTSEG)[rng.integers(0, 5, n_cust)]
    write(outdir, "customer", pa.table({
        "c_custkey": pa.array(ck),
        "c_name": pa.array([f"Customer#{i:09d}" for i in ck]),
        "c_nationkey": pa.array(c_nationkey),
        "c_acctbal": pa.array(c_acctbal),
        "c_mktsegment": pa.array(cust_seg),
    }), 1 << 17)

    sk = np.arange(n_supp, dtype=np.int64)
    write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(sk),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in sk]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2)),
    }), 1 << 17)

    pk = np.arange(n_part, dtype=np.int64)
    names = np.char.add(np.char.add(
        np.array(ADJ)[rng.integers(0, 8, n_part)], " "),
        np.array(NOUN)[rng.integers(0, 8, n_part)])
    write(outdir, "part", pa.table({
        "p_partkey": pa.array(pk),
        "p_name": pa.array(names),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PTYPE)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": pa.array(900.0 + (pk % 1000) / 10.0),
    }), 1 << 17)

    ok = np.arange(n_ord, dtype=np.int64)
    od_base = np.datetime64("1995-01-01", "us").astype(np.int64)
    od_days = rng.integers(0, 2405, n_ord)
    o_custkey = rng.integers(0, n_cust, n_ord)
    o_orderstatus = np.array(OSTATUS)[rng.integers(0, 3, n_ord)]
    o_totalprice = np.round(rng.uniform(1000, 500000, n_ord), 2)
    if effect:
        # planted DiD: treated (AUTOMOBILE) × post (>= 1997-01-01, day
        # 731 of the 1995-01-01 axis) orders shift +15% — q119 must
        # detect it; q120's placebo window ends before the shift
        post = od_days >= 731
        treated = cust_seg[o_custkey] == "AUTOMOBILE"
        o_totalprice = np.where(treated & post,
                                np.round(o_totalprice * 1.15, 2),
                                o_totalprice)
        # r15 planted trend: +50% linear drift over the full order-date
        # axis — q91 Mann-Kendall must read "increasing". Common to
        # both DiD groups, so the q119 contrast keeps its sign and the
        # q120 placebo difference still cancels in expectation.
        o_totalprice = np.round(
            o_totalprice * (1.0 + 0.5 * od_days / 2404.0), 2)
        # r15 planted MAD outliers: every 59th customer collapses to 2%
        # spend — LOW-side outliers so group variances are not inflated
        # (a high-side multiplier would erode q119's significance).
        # q53's dev > 3*MAD flag must catch every planted customer.
        o_totalprice = np.where((o_custkey % 59) == 0,
                                np.round(o_totalprice * 0.02, 2),
                                o_totalprice)
    write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(ok),
        "o_custkey": pa.array(o_custkey),
        "o_orderstatus": pa.array(o_orderstatus),
        "o_totalprice": pa.array(o_totalprice),
        "o_orderdate": ts_ms(od_base + od_days * DAY_US),
        "o_orderpriority": pa.array(np.array(OPRIO)[rng.integers(0, 5, n_ord)]),
    }), 1 << 17)

    nline = rng.poisson(4.0, n_ord)
    lok = np.repeat(ok, nline)
    n_li = lok.shape[0]
    lno = np.concatenate([np.arange(1, k + 1) for k in nline]) \
        if n_li else np.array([], dtype=np.int64)
    sd_base = np.datetime64("1995-01-02", "us").astype(np.int64)
    l_partkey = rng.integers(0, n_part, n_li)
    l_suppkey = rng.integers(0, n_supp, n_li)
    l_quantity = rng.integers(1, 51, n_li).astype(np.float64)
    l_extendedprice = np.round(rng.uniform(900, 105000, n_li), 2)
    l_discount = rng.integers(0, 11, n_li) / 100.0
    l_tax = rng.integers(0, 9, n_li) / 100.0
    l_returnflag = np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
    l_linestatus = np.array(["O", "F"])[rng.integers(0, 2, n_li)]
    l_shipdays = rng.integers(0, 2499, n_li)
    if effect:
        # planted odds ratio: discounted lines return with p(R)=0.40
        # (vs 1/3 baseline) — q116's CI must exclude 1
        exposed = l_discount >= 0.05
        redraw = rng.random(n_li)
        l_returnflag = np.where(
            exposed,
            np.where(redraw < 0.40, "R",
                     np.where(redraw < 0.70, "A", "N")),
            l_returnflag)
        # r15 planted runs-test clustering: H2-1996 shipments (shipdays
        # 546..729 of the 1995-01-02 axis = 1996-07-01..1996-12-31)
        # triple extendedprice, so q104's above/below-median sign
        # sequence over 1996 clusters into two long runs. x3 keeps the
        # exact 2dp grid (the np.round re-lands it).
        h2_1996 = (l_shipdays >= 546) & (l_shipdays < 730)
        l_extendedprice = np.where(h2_1996,
                                   np.round(l_extendedprice * 3.0, 2),
                                   l_extendedprice)
    write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(lok),
        "l_partkey": pa.array(l_partkey),
        "l_suppkey": pa.array(l_suppkey),
        "l_linenumber": pa.array(lno.astype(np.int32)),
        "l_quantity": pa.array(l_quantity),
        "l_extendedprice": pa.array(l_extendedprice),
        "l_discount": pa.array(l_discount),
        "l_tax": pa.array(l_tax),
        "l_returnflag": pa.array(l_returnflag),
        "l_linestatus": pa.array(l_linestatus),
        "l_shipdate": ts_ms(sd_base + l_shipdays * DAY_US),
    }), 1 << 17)

    # events: fixed 30-day window, exponential inter-arrival gaps
    ev_base = np.datetime64("2024-01-01", "us").astype(np.int64)
    mean_gap_us = 30 * DAY_US / n_ev
    gaps = rng.exponential(mean_gap_us, n_ev)
    ts_us = ev_base + np.cumsum(gaps).astype(np.int64)
    ev_user = rng.integers(0, max(n_cust // 10, 1), n_ev)
    if effect:
        # planted SPRT drift: purchase share among view+purchase = 0.6
        # (> the 0.52 H1) — q118's LLR path must cross accept_h1
        etypes = np.array(ETYPES)[rng.choice(
            5, n_ev, p=[0.20, 0.20, 0.24, 0.20, 0.16])]
    else:
        etypes = np.array(ETYPES)[rng.integers(0, 5, n_ev)]
    ev_value = np.round(rng.exponential(50.0, n_ev), 2)
    if effect:
        # r15 planted KS shift: purchase values sit +50 above the view
        # distribution (a pure location shift, D = 1 - e^-1 ~ 0.63) —
        # q90's two-sample KS must reject. Deterministic, no draws.
        ev_value = np.where(etypes == "purchase",
                            np.round(ev_value + 50.0, 2), ev_value)
        # r15 planted rate anomalies via an ORDER-PRESERVING piecewise
        # time warp (event_id stays arrival order, no draws):
        #   original days 12..15  -> [day12, day12+2h]   (12x-rate spike
        #       -- q69 STL residual and s18 hourly z must flag it)
        #   original days 15..22  -> 7 days from day12+2h (rate 1x)
        #   original days 22..30  -> 5.33 days at 1.5x    (sustained
        #       shift -- q55/s22 CUSUM max-|cusum| lands at day 11/12,
        #       the largest level break on the warped axis)
        off = (ts_us - ev_base).astype(np.float64)
        d = float(DAY_US)
        spike_end = 12 * d + 2 * 3600 * 1e6
        off = np.where(
            off < 12 * d, off,
            np.where(off < 15 * d, 12 * d + (off - 12 * d) / 36.0,
                     np.where(off < 22 * d, spike_end + (off - 15 * d),
                              spike_end + 7 * d + (off - 22 * d) / 1.5)))
        ts_us = off.astype(np.int64) + ev_base
    write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": ts_ns(ts_us),
        "user_id": pa.array(ev_user),
        "event_type": pa.array(etypes),
        "value": pa.array(ev_value),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]),
    }), 1 << 17)

    # documents: word salad + 5% planted near-dups (base doc + " dup")
    vocab = np.array(VOCAB)
    lens = rng.integers(10, 101, n_doc)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), k)]) for k in lens]
    is_dup = rng.random(n_doc) < 0.05
    for i in np.where(is_dup)[0]:
        base = int(rng.integers(0, n_doc))
        if base != i:
            texts[i] = texts[base] + " dup"
    write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n_doc, p=LANGW)]),
        "source": pa.array([f"src{k}" for k in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }), 1 << 15)

    # embeddings: unit-normalized 64-dim, uniform labels
    V = rng.standard_normal((n_emb, 64)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(V), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb).astype(np.int32)),
    }), 1 << 15)

    with open(os.path.join(outdir, "GENERATED.json"), "w") as f:
        json.dump({"sf": sf, "seed": SEED, "effect": effect,
                   "generator": "tools/gen_sf.py"}, f)


if __name__ == "__main__":
    main()
