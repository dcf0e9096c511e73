"""PNG + JPEG codecs, phash, PSNR (the per-row invariant of BASELINE.json:15)."""

import numpy as np
import pytest

from weaver_ray.functions.imaging import (
    decode_image,
    hamming64,
    phash64,
    png_decode,
    png_encode,
    psnr,
)
from weaver_ray.functions.jpegcodec import jpeg_decode, jpeg_encode
from weaver_ray.sources.corpus import gen_pixels, make_corpus_batch


def test_png_roundtrip_exact():
    for i in (0, 3, 57):
        px = gen_pixels(i)
        assert np.array_equal(png_decode(png_encode(px)), px)


def test_png_roundtrip_random_shapes():
    rng = np.random.default_rng(0)
    for _ in range(5):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(png_decode(png_encode(px)), px)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")


def test_jpeg_roundtrip_psnr():
    """Lossy branch of the per-row invariant: PSNR >= 40 dB at the corpus
    encoding quality, on the corpus's own jpeg rows (i % 5 == 0)."""
    for i in (0, 5, 35, 120):
        px = gen_pixels(i)
        out = jpeg_decode(jpeg_encode(px, quality=98))
        assert out.shape == px.shape and out.dtype == np.uint8
        assert psnr(px, out) >= 40.0


def test_jpeg_odd_shapes_and_determinism():
    rng = np.random.default_rng(3)
    for h, w in ((1, 1), (7, 9), (8, 8), (17, 33)):
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        blob = jpeg_encode(px, quality=98)
        assert blob == jpeg_encode(px, quality=98)   # deterministic bytes
        out = jpeg_decode(blob)
        assert out.shape == (h, w, 3)
    # standard container markers: SOI/JFIF APP0/EOI
    assert blob[:2] == b"\xff\xd8" and blob[2:4] == b"\xff\xe0"
    assert blob[-2:] == b"\xff\xd9"


def test_jpeg_rejects_garbage():
    with pytest.raises(ValueError):
        jpeg_decode(b"definitely not a jpeg")


def test_corpus_row_invariant():
    # rows 5/10/15 are jpeg (i % 5 == 0), 3/7 are png — both branches run
    t = make_corpus_batch(np.array([3, 5, 7, 10, 15]))
    saw = set()
    for r in range(t.num_rows):
        fmt = t.column("fmt")[r].as_py()
        saw.add(fmt)
        blob = t.column("bytes")[r].as_py()
        i = int(t.column("image_id")[r].as_py()[3:])
        ref = gen_pixels(i)
        got = decode_image(blob, fmt)
        if fmt == "png":
            assert np.array_equal(got, ref)          # lossless: exact
            assert psnr(got, ref) == float("inf")
        else:
            assert psnr(got, ref) >= 40.0            # lossy: PSNR bar
        assert t.column("phash")[r].as_py() == phash64(ref)
        assert t.column("w")[r].as_py() == ref.shape[1]
        assert t.column("h")[r].as_py() == ref.shape[0]
    assert saw == {"png", "jpeg"}


def test_phash_properties():
    px = gen_pixels(1)
    assert phash64(px) == phash64(px.copy())
    # small perturbation -> small hamming distance; different image -> larger
    noisy = px.copy()
    noisy[0, 0] = 255 - noisy[0, 0]
    a = np.array([phash64(px)], dtype=np.int64)
    assert hamming64(a, phash64(noisy))[0] <= 4
    assert hamming64(a, phash64(gen_pixels(999)))[0] > 4


def test_psnr_scale():
    px = gen_pixels(2).astype(np.float64)
    noisy = np.clip(px + np.random.default_rng(1).normal(0, 2.0, px.shape), 0, 255).astype(np.uint8)
    assert psnr(px.astype(np.uint8), noisy) >= 40.0


# ------------------------------------------------------------------ image-axis pipelines

def test_image_phash_clusters_recover_planted(ray_session):
    """Every planted noisy variant must land in its base image's cluster,
    and no cluster may span two distinct base images (false merge)."""
    import pandas as pd

    from weaver_ray.pipelines import images

    cl = images.image_phash_clusters("unused", n_base=1000)
    # node scheme: base of any image id = first 8 digits
    cl = cl.assign(base=cl["image_id"].str.slice(0, 11))
    by_base = cl.groupby("base")["cluster_id"].nunique()
    assert (by_base == 1).all()          # variants joined their base
    by_cluster = cl.groupby("cluster_id")["base"].nunique()
    assert (by_cluster == 1).all()       # no false merges
    assert cl["cluster_id"].nunique() == 1000


def test_image_phash_banding_equals_bruteforce(ray_session):
    """4x16-band blocking at hamming<=3 is lossless vs all-pairs
    (pigeonhole) — checked against a numpy brute force over the same
    phash universe."""
    import itertools

    import pyarrow.parquet as pq

    from weaver_ray.functions.imaging import hamming64
    from weaver_ray.pipelines import images
    from weaver_ray.sources.corpus import generate_corpus

    base = pq.read_table(
        sorted(__import__("glob").glob(generate_corpus(1000) + "/part-*.parquet"))[0],
        columns=["image_id", "phash"])
    var = pq.read_table(images.generate_variants(1000) + "/part-00000.parquet",
                        columns=["image_id", "phash"])
    ids = base.column("image_id").to_pylist() + var.column("image_id").to_pylist()
    ph = np.concatenate([base.column("phash").to_numpy(),
                         var.column("phash").to_numpy()]).astype(np.int64)
    order = np.argsort(np.array(ids))
    ids = [ids[k] for k in order]
    ph = ph[order]
    a, b = np.triu_indices(len(ids), k=1)
    ham = hamming64(ph[a], ph[b])
    keep = ham <= 3
    brute = {(ids[i], ids[j], int(h))
             for i, j, h in zip(a[keep], b[keep], ham[keep])}
    engine = images.image_phash_pairs("unused", n_base=1000)
    got = set(zip(engine["image_a"], engine["image_b"], engine["hamming"]))
    assert got == brute


def test_variant_corpus_deterministic_and_decodable():
    """Variant rows re-decode to the exact stored phash (PNG lossless) and
    regeneration is byte-identical (the oracle depends on determinism)."""
    import pyarrow.parquet as pq

    from weaver_ray.functions.imaging import decode_image, phash64 as ph64
    from weaver_ray.pipelines import images

    d = images.generate_variants(1000)
    t = pq.read_table(d + "/part-00000.parquet")
    for k in range(0, t.num_rows, 37):
        px = decode_image(t.column("bytes")[k].as_py(), "png")
        assert ph64(px) == t.column("phash")[k].as_py()
        assert px.shape == (t.column("h")[k].as_py(), t.column("w")[k].as_py(), 3)
    # regeneration determinism: rebuild one chunk serially and compare
    import pyarrow.feather as feather

    from weaver_ray.sources.corpus import generate_corpus

    base = feather.read_table(generate_corpus(1000) + "/corpus.feather")
    rebuilt = images._make_variant_rows(base, np.array([0, 4, 8]), 42)
    stored = t.slice(0, rebuilt.num_rows)
    assert rebuilt.equals(stored.select(rebuilt.schema.names))


def test_image_phash_topk_ranks_variants_first():
    """Similarity search: a query image with planted noisy variants must
    rank them at the top (hamming <= 2 by construction), ranks must be
    dense 1..k per query, and hamming must be nondecreasing within a
    query (ties broken by image_id)."""
    from weaver_ray.pipelines import images

    out = images.image_phash_topk("unused", k=5, n_queries=20, n_base=1000)
    assert set(out.columns) == {"query_id", "image_id", "hamming", "rank"}
    assert out.groupby("query_id")["rank"].apply(
        lambda r: list(r) == list(range(1, len(r) + 1))).all()
    for qid, g in out.groupby("query_id"):
        assert (g["hamming"].diff().dropna() >= 0).all()
        assert (g["image_id"] != qid).all()  # self excluded
        i = int(qid[3:11])
        n_var = images._chosen_variants(i)
        if n_var:  # planted variants are the nearest neighbors
            top = set(g.head(n_var)["image_id"])
            assert top == {f"{qid}v{j}" for j in range(n_var)}
            assert (g.head(n_var)["hamming"] <= 2).all()


def test_caption_stats_by_fmt_totals():
    """Cross-modal caption profile: per-fmt counts must partition the
    corpus and token sums must match a direct pandas recount."""
    import glob
    import re

    import pyarrow.parquet as pq

    from weaver_ray.pipelines import images
    from weaver_ray.sources.corpus import generate_corpus

    out = images.caption_stats_by_fmt("unused", n_base=1000)
    t = pq.read_table(sorted(glob.glob(generate_corpus(1000) + "/part-*.parquet")),
                      columns=["fmt", "caption"]).to_pandas()
    assert int(out["n_images"].sum()) == len(t)
    want = t.groupby("fmt")["caption"].apply(
        lambda s: int(s.str.count(r"\w+").sum()))
    got = dict(zip(out["fmt"], out["sum_tokens"]))
    assert got == want.to_dict()


def test_multimodal_joint_pairs_cross_modal(ray_session):
    """Joint pairs are a subset of the phash candidates; every planted
    base<->variant pair survives (captions identical -> jaccard 1.0)."""
    from weaver_ray.pipelines import images

    mm = images.multimodal_joint_pairs("unused", n_base=1000)
    ph = images.image_phash_pairs("unused", n_base=1000)
    mm_keys = set(zip(mm["image_a"], mm["image_b"]))
    ph_keys = set(zip(ph["image_a"], ph["image_b"]))
    assert mm_keys <= ph_keys
    planted = {(a, b) for a, b in ph_keys if b.startswith(a + "v")
               or (a[:11] == b[:11] and "v" in a and "v" in b)}
    assert planted <= mm_keys
    byk = mm.set_index(["image_a", "image_b"])
    for k in planted:
        assert byk.loc[k, "caption_jaccard"] == 1.0
    assert (mm["caption_jaccard"] >= 0.5).all()
    assert (mm["hamming"] <= 3).all()


def test_image_exact_dedup_recovers_planted_copies(ray_session):
    """Every planted byte-identical copy (imgNNNNNNNNv6) resolves to its
    base image; noisy variants and bases are their own keepers (exact
    dedup must NOT touch near-dups — that's the phash pass's job)."""
    from weaver_ray.pipelines import images

    out = images.image_exact_dedup("unused", n_base=1000)
    assert len(out) == 1475  # 1000 base + 375 variants + 100 copies
    nontrivial = out[out["image_id"] != out["keeper_image_id"]]
    assert len(nontrivial) == 100
    assert all(i.endswith("v6") for i in nontrivial["image_id"])
    assert all(k == i[:-2] for i, k in zip(nontrivial["image_id"],
                                           nontrivial["keeper_image_id"]))


def test_curated_image_pairs_is_leg_intersection(ray_session):
    """The composed image curation equals the set intersection of its
    three legs, drops every planted copy AND every noisy variant, and is
    non-degenerate (gates cut some bases, most bases survive)."""
    import glob

    import pyarrow.parquet as pq

    from weaver_ray.pipelines import images
    from weaver_ray.sources.corpus import generate_corpus

    cur = set(images.curated_image_pairs("unused", n_base=1000)["image_id"])
    # no copy or variant can be its cluster's canonical (base node id is
    # always smaller), so every survivor is a base image
    assert all("v" not in i[3:] for i in cur)
    # independent gate recount over the base table
    t = pq.read_table(
        sorted(glob.glob(generate_corpus(1000) + "/part-*.parquet")),
        columns=["image_id", "w", "h", "caption"]).to_pandas()
    lo = t[["w", "h"]].min(axis=1)
    hi = t[["w", "h"]].max(axis=1)
    ntok = t["caption"].str.count(r"[A-Za-z0-9_]+")
    gate_ok = set(t["image_id"][(lo >= 48) & (hi <= 2 * lo) & (ntok >= 6)])
    exact = images.image_exact_dedup("unused", n_base=1000)
    keepers = set(exact["image_id"][exact["image_id"]
                                    == exact["keeper_image_id"]])
    clusters = images.image_phash_clusters("unused", n_base=1000)
    # canonical wrt base∪variants is necessary (the extended universe only
    # ADDS hamming-0 copies, which never displace a base canonical)
    canon = set(
        clusters["image_id"][[images._node_ids(clusters["image_id"])[i]
                              == clusters["cluster_id"][i]
                              for i in range(len(clusters))]])
    assert cur == gate_ok & keepers & canon
    assert 100 < len(cur) < 1000


def test_generate_dups_empty_plan_writes_typed_empty():
    """n_base < 4 selects no copy rows (_chosen_dup first fires at i%10==3):
    the empty keep index must stay int64 so take() yields an empty table."""
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.images import generate_dups

    d = generate_dups(n_base=3)
    t = pq.read_table(d + "/part-00000.parquet")
    assert t.num_rows == 0 and "image_id" in t.schema.names


def test_contrastive_negatives_derangement(ray_session):
    """Every image gets exactly k negatives, never its own caption, and
    the pairing is identical across two runs (determinism under
    re-execution)."""
    import pandas as pd

    from weaver_ray.pipelines.common import to_table
    from weaver_ray.pipelines.images import contrastive_negative_pairs

    a = (to_table(contrastive_negative_pairs("unused")).to_pandas()
         .sort_values(["image_id", "neg_rank"]).reset_index(drop=True))
    assert (a.groupby("image_id").size() == 2).all()
    assert (a["image_id"] != a["neg_image_id"]).all()
    b = (to_table(contrastive_negative_pairs("unused")).to_pandas()
         .sort_values(["image_id", "neg_rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # negatives differ between ranks (stride 1x vs 2x lands elsewhere)
    by_img = a.pivot(index="image_id", columns="neg_rank",
                     values="neg_image_id")
    assert (by_img[1] != by_img[2]).all()


def test_aspect_assign_matches_exact_rational_argmin():
    """The integer-score argmin must equal the true rational-distance
    argmin |w/h - wb/hb| (computed with fractions.Fraction), and ties
    must break to the smallest bucket index — pinned on a constructed
    exact tie (17/12 is equidistant from 4/3 and 3/2)."""
    from fractions import Fraction

    import pandas as pd

    from weaver_ray.pipelines.images import ASPECT_BUCKETS, _aspect_assign

    dims = [(100, 100), (400, 300), (299, 400), (1600, 900), (90, 160),
            (150, 100), (100, 150), (641, 480), (479, 640), (17, 12),
            (1, 1000), (1000, 1)]
    df = pd.DataFrame({
        "image_id": [f"t{i:03d}" for i in range(len(dims))],
        "w": np.asarray([d[0] for d in dims], dtype=np.int32),
        "h": np.asarray([d[1] for d in dims], dtype=np.int32)})
    out = _aspect_assign(df)
    for i, (w, h) in enumerate(dims):
        dists = [abs(Fraction(w, h) - Fraction(wb, hb))
                 for wb, hb in ASPECT_BUCKETS]
        expect = dists.index(min(dists))  # first minimum = smallest index
        assert out["bucket_idx"][i] == expect, (w, h)
    # the constructed tie resolves to bucket 1 (4:3), not bucket 5 (3:2)
    assert out.loc[out["image_id"] == "t009", "bucket_idx"].item() == 1


def test_aspect_bucket_assign_covers_corpus(ray_session):
    """Every corpus image gets exactly one bucket; bucket dims come from
    the fixed list."""
    from weaver_ray.pipelines.images import ASPECT_BUCKETS, aspect_bucket_assign

    out = aspect_bucket_assign("/root/testdata/sf0.001", n_base=200)
    assert len(out) == 200
    assert out["image_id"].is_unique
    got = set(zip(out["bucket_w"], out["bucket_h"]))
    assert got <= set(ASPECT_BUCKETS)


def test_image_byte_entropy_matches_counter_replay(ray_session):
    """Sequential replay: every row's entropy must equal the
    collections.Counter recomputation over the same stored blob (H =
    log2(n) - sum(c*log2 c)/n, 4 dp half-away), with entropies inside
    [0, 8] bits and both corpus formats represented."""
    import math
    from collections import Counter

    import pyarrow.parquet as pq_

    from weaver_ray.pipelines.common import sql_round
    from weaver_ray.pipelines.images import image_byte_entropy
    from weaver_ray.sources.corpus import generate_corpus

    out = image_byte_entropy("/root/testdata/sf0.001", n_base=200).to_pandas()
    files = sorted(
        str(p) for p in __import__("pathlib").Path(
            generate_corpus(200)).glob("part-*.parquet"))
    raw = pq_.ParquetDataset(files).read(
        columns=["image_id", "bytes"]).to_pydict()
    blobs = dict(zip(raw["image_id"], raw["bytes"]))
    assert len(out) == len(blobs)
    for r in out.itertuples(index=False):
        b = blobs[r.image_id]
        assert r.n_bytes == len(b)
        c = Counter(b)
        n = len(b)
        h = math.log2(n) - sum(v * math.log2(v) for v in c.values()) / n
        assert r.byte_entropy == float(sql_round(h, 4)), r.image_id
        assert 0.0 <= r.byte_entropy <= 8.0
    assert out["fmt"].nunique() >= 2  # both corpus formats present


def test_caption_pixels_corr_matches_numpy(ray_session):
    """The integer-moment closed form must equal numpy's corrcoef on the
    same (token count, area) columns per format, and sit inside [-1, 1]."""
    import re

    import pyarrow.parquet as pq_

    from weaver_ray.pipelines.common import sql_round
    from weaver_ray.pipelines.images import caption_pixels_corr
    from weaver_ray.sources.corpus import generate_corpus

    out = caption_pixels_corr("/root/testdata/sf0.001", n_base=200)
    files = sorted(
        str(p) for p in __import__("pathlib").Path(
            generate_corpus(200)).glob("part-*.parquet"))
    raw = pq_.ParquetDataset(files).read(
        columns=["fmt", "w", "h", "caption"]).to_pandas()
    raw["x"] = raw["caption"].str.count(r"\w+")
    raw["y"] = raw["w"].astype(np.int64) * raw["h"].astype(np.int64)
    assert len(out) >= 1
    for r in out.itertuples(index=False):
        sub = raw[raw["fmt"] == r.fmt]
        assert r.n_images == len(sub)
        expect = np.corrcoef(sub["x"].to_numpy(np.float64),
                             sub["y"].to_numpy(np.float64))[0, 1]
        assert abs(r.corr_tokens_pixels - expect) < 1e-6
        assert -1.0 <= r.corr_tokens_pixels <= 1.0


def test_image_chunk_dedup_sequential_replay(ray_session):
    """Engine chunk stats == a sequential hashlib/Counter replay over the
    same blobs, and every planted byte-identical copy (and its base)
    scores dup_fraction 1.0."""
    import hashlib
    from collections import Counter

    import pyarrow.parquet as pq

    from weaver_ray.pipelines.images import (CHUNK_BYTES, generate_dups,
                                             image_chunk_dedup)
    from weaver_ray.sources.corpus import generate_corpus

    base = pq.read_table(generate_corpus(1000) + "/part-00000.parquet",
                         columns=["image_id", "bytes"]).to_pandas()
    dup = pq.read_table(generate_dups(1000) + "/part-00000.parquet",
                        columns=["image_id", "bytes"]).to_pandas()
    import pandas as pd
    blobs = pd.concat([base, dup], ignore_index=True)

    step = 2 * CHUNK_BYTES
    per_img = {}
    owners = Counter()
    for iid, blob in zip(blobs["image_id"], blobs["bytes"]):
        hx = bytes(blob).hex().upper()
        chunks = {hashlib.md5(hx[p:p + step].encode()).hexdigest()
                  for p in range(0, len(hx), step)}
        per_img[iid] = chunks
        owners.update(chunks)

    out = (image_chunk_dedup("/root/testdata/sf0.001").to_pandas()
           .set_index("image_id"))
    assert len(out) == len(per_img)
    for iid, chunks in per_img.items():
        shared = sum(owners[c] > 1 for c in chunks)
        assert out.loc[iid, "n_chunks"] == len(chunks)
        assert out.loc[iid, "n_shared"] == shared
    # the planted copies and their bases dedup completely
    for iid in dup["image_id"]:
        assert out.loc[iid, "dup_fraction"] == 1.0
    # and the fraction is non-trivial in between (format headers shared)
    assert out["dup_fraction"].between(0, 1).all()
    assert (out["dup_fraction"] < 1.0).any()


def test_jpeg_decoder_skips_t81_fill_bytes():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker;
    a padded stream must decode identically (ADVICE r3: fill bytes read
    as marker=0xFF + garbage length)."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    enc = jpeg_encode(px, quality=90)
    padded = enc[:2] + b"\xff\xff\xff" + enc[2:]  # fill before APP0
    np.testing.assert_array_equal(jpeg_decode(padded), jpeg_decode(enc))
