"""Tests for crawl-graph ops: href extraction (text/links.py) and exact
fixed-point distributed PageRank (graph/pagerank.py) vs a numpy reference."""

import numpy as np
import pyarrow as pa
import ray

from incubator_sedona_ray.text.links import extract_links, extract_links_batch

# ------------------------------------------------------------ link extract


def test_extract_links_batch_resolution():
    t = pa.table(
        {
            "url": ["https://a.com/p/1", "http://b.org/x/y", "https://c.net/"],
            "html": [
                b'<a href="https://z.io/q">z</a><a href="/root">r</a>'
                b'<a href="mailto:x@y">m</a><a href="#f">f</a><a href="rel.html">rel</a>',
                b'no anchors at all',
                b'<a href="//proto.rel/x">p</a><a href="/only">o</a>',
            ],
        }
    )
    out = extract_links_batch(t).to_pydict()
    assert out["src_url"] == ["https://a.com/p/1", "https://a.com/p/1", "https://c.net/"]
    assert out["href"] == ["https://z.io/q", "/root", "/only"]
    # protocol-relative "//proto.rel/x" starts with "/" ... it must NOT:
    # spec-wise it's scheme-relative; our contract keeps only ^/[^/] root
    # paths or absolutes — check what the kernel actually does below.
    assert out["dst_url"] == ["https://z.io/q", "https://a.com/root", "https://c.net/only"]


def test_extract_links_empty_and_unicode():
    t = pa.table(
        {
            "url": ["https://u.de/p"],
            "html": ['<a href="/päth">ü</a>'.encode("utf-8")],
        }
    )
    out = extract_links_batch(t).to_pydict()
    assert out["dst_url"] == ["https://u.de/päth"]
    empty = extract_links_batch(
        pa.table({"url": pa.array([], type=pa.string()), "html": pa.array([], type=pa.binary())})
    )
    assert empty.num_rows == 0
    assert empty.column_names == ["src_url", "href", "dst_url"]


def test_extract_links_dataset(ray_session):
    t = pa.table(
        {
            "url": [f"https://d{i}.com/p/{i}" for i in range(50)],
            "html": [
                f'<p>x</p><a href="/n/{i + 1}">n</a><a href="https://hub.com/{i % 5}">h</a>'.encode()
                for i in range(50)
            ],
        }
    )
    out = extract_links(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 100
    assert (out.groupby("src_url").size() == 2).all()


# ------------------------------------------------------------ pagerank


def _ref_pagerank_fp(edges, n, iters=5, scale=10**12, dnum=85, dden=100):
    """Sequential fixed-point reference: same integer recurrence."""
    deg = np.zeros(n, dtype=np.int64)
    for s, _ in edges:
        deg[s] += 1
    r = np.full(n, scale // n, dtype=np.int64)
    base = ((dden - dnum) * (scale // n)) // dden
    for _ in range(iters):
        dang = int(r[deg == 0].sum())
        contrib = np.zeros(n, dtype=np.int64)
        for s, d in edges:
            contrib[d] += r[s] // deg[s]
        r = base + (dnum * (contrib + dang // n)) // dden
    return r


def _run_pagerank(edges, n, iters=5, mode="auto"):
    from incubator_sedona_ray.graph.pagerank import pagerank

    e = pa.table(
        {
            "src": pa.array([s for s, _ in edges], type=pa.int64()),
            "dst": pa.array([d for _, d in edges], type=pa.int64()),
        }
    )
    nodes = pa.table({"node": pa.array(range(n), type=pa.int64())})
    out = pagerank(
        ray.data.from_arrow(e),
        ray.data.from_arrow(nodes),
        iters=iters,
        num_partitions=3,
        mode=mode,
    ).to_pandas()
    assert len(out) == n
    got = np.zeros(n, dtype=np.int64)
    got[out["node"].to_numpy()] = out["rank_fp"].to_numpy()
    assert np.allclose(out["rank"], out["rank_fp"] / 1e12)
    return got


def test_pagerank_matches_reference(ray_session):
    rnd = np.random.default_rng(3)
    n = 60
    edges = [(int(rnd.integers(0, n)), int(rnd.integers(0, n))) for _ in range(200)]
    want = _ref_pagerank_fp(edges, n)
    # both execution plans must be BIT-equal to the sequential recurrence
    assert np.array_equal(_run_pagerank(edges, n, mode="dense"), want)
    assert np.array_equal(_run_pagerank(edges, n, mode="bsp"), want)


def test_pagerank_dangling_and_isolated(ray_session):
    # node 3 dangles (no out-edges), node 4 is fully isolated
    edges = [(0, 1), (1, 2), (2, 0), (0, 3), (2, 3)]
    n = 5
    want = _ref_pagerank_fp(edges, n, iters=4)
    for mode in ("dense", "bsp"):
        got = _run_pagerank(edges, n, iters=4, mode=mode)
        assert np.array_equal(got, want), mode
        # total mass ~1 (fixed-point floor loses at most a few units/node)
        assert abs(got.sum() - 10**12) < 10 * n


def test_pagerank_multi_edges_count_multiply(ray_session):
    edges = [(0, 1), (0, 1), (1, 0)]  # double edge 0->1
    got = _run_pagerank(edges, 2, iters=3)
    want = _ref_pagerank_fp(edges, 2, iters=3)
    assert np.array_equal(got, want)


def _ref_ppr_fp(edges, n, seeds, iters=5, scale=10**12, dnum=85, dden=100):
    deg = np.zeros(n, dtype=np.int64)
    for s, _ in edges:
        deg[s] += 1
    S = len(seeds)
    r = np.zeros(n, dtype=np.int64)
    r[list(seeds)] = scale // S
    base = np.zeros(n, dtype=np.int64)
    base[list(seeds)] = ((dden - dnum) * (scale // S)) // dden
    sm = np.zeros(n, dtype=np.int64)
    sm[list(seeds)] = 1
    for _ in range(iters):
        dang = int(r[deg == 0].sum())
        contrib = np.zeros(n, dtype=np.int64)
        for s, d in edges:
            contrib[d] += r[s] // deg[s]
        r = base + (dnum * (contrib + (dang // S) * sm)) // dden
    return r


def test_personalized_pagerank_matches_reference(ray_session):
    from incubator_sedona_ray.graph.pagerank import pagerank

    rnd = np.random.default_rng(17)
    n = 50
    edges = [(int(rnd.integers(0, n)), int(rnd.integers(0, n))) for _ in range(150)]
    seeds = [0, 13, 31]
    e = pa.table(
        {
            "src": pa.array([s for s, _ in edges], type=pa.int64()),
            "dst": pa.array([d for _, d in edges], type=pa.int64()),
        }
    )
    nodes = pa.table({"node": pa.array(range(n), type=pa.int64())})
    sd = pa.table({"node": pa.array(seeds, type=pa.int64())})
    out = pagerank(
        ray.data.from_arrow(e),
        ray.data.from_arrow(nodes),
        iters=4,
        seeds=ray.data.from_arrow(sd),
    ).to_pandas()
    got = np.zeros(n, dtype=np.int64)
    got[out["node"].to_numpy()] = out["rank_fp"].to_numpy()
    want = _ref_ppr_fp(edges, n, seeds, iters=4)
    assert np.array_equal(got, want)
    # restart mass concentrates at/around seeds
    assert got[seeds].sum() > got.sum() * 0.2


def test_personalized_pagerank_bsp_bit_equal(ray_session):
    from incubator_sedona_ray.graph.pagerank import pagerank

    rnd = np.random.default_rng(21)
    n = 30
    edges = [(int(rnd.integers(0, n)), int(rnd.integers(0, n))) for _ in range(90)]
    seeds = [2, 17]
    e = pa.table(
        {
            "src": pa.array([s for s, _ in edges], type=pa.int64()),
            "dst": pa.array([d for _, d in edges], type=pa.int64()),
        }
    )
    nodes = pa.table({"node": pa.array(range(n), type=pa.int64())})
    sd = pa.table({"node": pa.array(seeds, type=pa.int64())})
    want = _ref_ppr_fp(edges, n, seeds, iters=3)
    for mode in ("dense", "bsp"):
        out = pagerank(
            ray.data.from_arrow(e),
            ray.data.from_arrow(nodes),
            iters=3,
            seeds=ray.data.from_arrow(sd),
            mode=mode,
            num_partitions=4,
        ).to_pandas()
        got = np.zeros(n, dtype=np.int64)
        got[out["node"].to_numpy()] = out["rank_fp"].to_numpy()
        assert np.array_equal(got, want), mode


def test_pagerank_bsp_partition_count_invariant(ray_session):
    """The Pregel-style BSP engine must be BIT-invariant to the range
    count (a real cluster sizes R by graph, not workers) — including
    R=1 (single-range degenerate) and R>n (empty ranges)."""
    from incubator_sedona_ray.graph.pagerank import pagerank

    rnd = np.random.default_rng(11)
    n = 37
    edges = [(int(rnd.integers(0, n)), int(rnd.integers(0, n))) for _ in range(120)]
    e = pa.table(
        {
            "src": pa.array([s for s, _ in edges], type=pa.int64()),
            "dst": pa.array([d for _, d in edges], type=pa.int64()),
        }
    )
    nodes = pa.table({"node": pa.array(range(n), type=pa.int64())})
    outs = []
    for R in (1, 2, 5, 64):
        out = (
            pagerank(
                ray.data.from_arrow(e),
                ray.data.from_arrow(nodes),
                iters=3,
                num_partitions=R,
                mode="bsp",
            )
            .to_pandas()
            .sort_values("node")
        )
        outs.append(out["rank_fp"].to_numpy())
    for o in outs[1:]:
        assert np.array_equal(outs[0], o)


def test_pagerank_bsp_checkpoint_resume_bit_equal(ray_session, tmp_path):
    """Kill-and-resume: a run checkpointed at iter 2 and resumed to 5
    must be BIT-equal to an uninterrupted 5-iter run; a parameter change
    (damping) must invalidate the checkpoint, not corrupt the result."""
    from incubator_sedona_ray.graph.pagerank import pagerank

    rnd = np.random.default_rng(23)
    n = 50
    edges = [(int(rnd.integers(0, n)), int(rnd.integers(0, n))) for _ in range(170)]
    e = pa.table(
        {
            "src": pa.array([s for s, _ in edges], type=pa.int64()),
            "dst": pa.array([d for _, d in edges], type=pa.int64()),
        }
    )
    nodes = pa.table({"node": pa.array(range(n), type=pa.int64())})

    def run(iters, ckpt=None, every=0, damping=85):
        return (
            pagerank(
                ray.data.from_arrow(e),
                ray.data.from_arrow(nodes),
                iters=iters,
                num_partitions=4,
                mode="bsp",
                damping_num=damping,
                checkpoint_dir=ckpt,
                checkpoint_every=every,
            )
            .to_pandas()
            .sort_values("node")["rank_fp"]
            .to_numpy()
        )

    want = run(5)
    ck = str(tmp_path / "pr_ckpt")
    # phase 1: run only 2 iters, checkpointing each — simulates a crash after 2
    run(2, ckpt=ck, every=1)
    import json, os

    meta = json.load(open(os.path.join(ck, "_META.json")))
    assert meta["iter_done"] == 1  # last ckpt BEFORE the final iter of that run
    # phase 2: same params, full 5 iters — resumes from the checkpoint
    got = run(5, ckpt=ck, every=1)
    assert np.array_equal(got, want)
    # prove the LOAD path actually ran: tamper a checkpointed slice (the
    # phase-2 run left iter_done=4) — one resumed iteration over the
    # poisoned state must now produce a DIFFERENT fixed point
    assert json.load(open(os.path.join(ck, "_META.json")))["iter_done"] == 4
    import pyarrow.parquet as pq

    f = os.path.join(ck, "rank_fp_0.parquet")
    t = pq.read_table(f)
    pq.write_table(
        pa.table({"rank_fp": pa.array(t["rank_fp"].to_numpy() + 10**9)}), f
    )
    poisoned = run(5, ckpt=ck, every=0)
    assert not np.array_equal(poisoned, want)
    # changed damping: checkpoint must be IGNORED (params mismatch) —
    # the poisoned files are invisible to a mismatched fingerprint
    got90 = run(5, ckpt=ck, every=0, damping=90)
    fresh90 = run(5, damping=90)
    assert np.array_equal(got90, fresh90)
    assert not np.array_equal(got90, want)
