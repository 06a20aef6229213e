import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_similarity_tpu.models import build_encoder
from multimodal_similarity_tpu.parallel import create_mesh
from multimodal_similarity_tpu.serving import EmbeddingService, RetrievalIndex


def test_embedding_service_padded_batches(rng):
    model = build_encoder("rtsn", num_seg=3, emb_dim=16, n_input=8)
    x = rng.randn(10, 3, 8).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:2]))["params"]
    svc = EmbeddingService(model, params, batch_size=4)
    emb = svc.embed(x)
    assert emb.shape == (10, 16)
    # identical to direct apply + normalize
    direct = model.apply({"params": params}, jnp.asarray(x))
    direct = np.asarray(direct / jnp.linalg.norm(direct, axis=1,
                                                 keepdims=True))
    np.testing.assert_allclose(emb, direct, rtol=1e-5, atol=1e-5)


def test_retrieval_index_exact(rng):
    idx = RetrievalIndex(emb_dim=8)
    gallery = rng.randn(50, 8).astype(np.float32)
    idx.add(gallery, metadata=[f"item{i}" for i in range(50)])
    q = gallery[7:9] + 1e-4
    d, ids, meta = idx.query(q, k=3)
    assert ids[0, 0] == 7 and ids[1, 0] == 8
    assert meta[0][0] == "item7"
    assert (np.diff(d, axis=1) >= -1e-6).all()


def test_retrieval_index_sharded_matches_local(rng):
    mesh = create_mesh(8)
    gallery = rng.randn(60, 8).astype(np.float32)  # 60 pads to 64
    q = rng.randn(5, 8).astype(np.float32)
    local = RetrievalIndex(emb_dim=8)
    local.add(gallery)
    sharded = RetrievalIndex(emb_dim=8, mesh=mesh)
    sharded.add(gallery)
    d1, i1, _ = local.query(q, k=5)
    d2, i2, _ = sharded.query(q, k=5)
    np.testing.assert_allclose(np.sort(d1, 1), np.sort(d2, 1), rtol=1e-4,
                               atol=1e-5)


def test_retrieval_index_empty():
    idx = RetrievalIndex(emb_dim=4)
    with pytest.raises(ValueError):
        idx.query(np.zeros((1, 4), np.float32))


def test_chunked_topk_matches_dense(rng):
    import jax.numpy as jnp
    from multimodal_similarity_tpu.ops.chunked_topk import chunked_topk
    from multimodal_similarity_tpu.ops.distances import pairwise_distance
    q = jnp.asarray(rng.randn(7, 12).astype(np.float32))
    g = jnp.asarray(rng.randn(103, 12).astype(np.float32))  # non-multiple
    d, i = chunked_topk(q, g, k=9, chunk=32)
    dense = np.asarray(pairwise_distance(q, g, "euclidean"))
    want_d = np.sort(dense, axis=1)[:, :9]
    np.testing.assert_allclose(np.asarray(d), want_d, rtol=1e-4, atol=1e-5)
    got_d = np.take_along_axis(dense, np.asarray(i), axis=1)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-5)


def test_chunked_topk_k_exceeds_gallery(rng):
    import jax.numpy as jnp
    from multimodal_similarity_tpu.ops.chunked_topk import chunked_topk
    q = jnp.asarray(rng.randn(2, 4).astype(np.float32))
    g = jnp.asarray(rng.randn(5, 4).astype(np.float32))
    d, i = chunked_topk(q, g, k=8, chunk=4)
    # padding entries marked with -1 index and +inf distance
    assert (np.asarray(i)[:, 5:] == -1).all()
    assert (np.asarray(d)[:, 5:] > 1e29).all()


def test_retrieval_index_chunked_path(rng):
    gallery = rng.randn(40, 8).astype(np.float32)
    small = RetrievalIndex(emb_dim=8)
    small.add(gallery)
    big = RetrievalIndex(emb_dim=8, gallery_chunk=16)  # force streaming
    big.add(gallery)
    q = rng.randn(3, 8).astype(np.float32)
    d1, i1, _ = small.query(q, k=5)
    d2, i2, _ = big.query(q, k=5)
    np.testing.assert_allclose(d1, d2, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(i1, i2)


def test_retrieval_index_gallery_cached_and_invalidated(rng):
    """The gallery uploads to device once per add() generation; adding rows
    invalidates the cache and new rows are retrievable."""
    from multimodal_similarity_tpu.serving import RetrievalIndex

    idx = RetrievalIndex(8)
    idx.add(rng.randn(32, 8).astype(np.float32))
    q = rng.randn(4, 8).astype(np.float32)
    idx.query(q, k=3)
    cached = idx._device_gallery
    assert cached is not None
    idx.query(q, k=3)
    assert idx._device_gallery is cached  # reused, not re-uploaded

    target = q[0:1] + 1e-4
    idx.add(target)
    assert idx._device_gallery is None    # invalidated
    d, i, _ = idx.query(q[0:1], k=1)
    assert int(i[0, 0]) == 32             # the new row wins


def test_retrieval_index_guards_and_1d_query(rng):
    from multimodal_similarity_tpu.serving import RetrievalIndex

    idx = RetrievalIndex(emb_dim=8)
    with pytest.raises(ValueError):
        idx.add(rng.randn(10, 8).astype(np.float32), metadata=["a"] * 5)
    idx.add(rng.randn(10, 8).astype(np.float32),
            metadata=[f"m{i}" for i in range(10)])
    idx.add(rng.randn(6, 8).astype(np.float32),
            metadata=[f"n{i}" for i in range(6)])
    assert len(idx) == 16
    # single 1-D query vector -> Q=1 results
    d, ids, meta = idx.query(rng.randn(8).astype(np.float32), k=3)
    assert d.shape == (1, 3) and ids.shape == (1, 3)
    assert len(meta) == 1 and len(meta[0]) == 3
    # metadata stays aligned across multiple adds
    all_meta = [f"m{i}" for i in range(10)] + [f"n{i}" for i in range(6)]
    for j, m in zip(ids[0], meta[0]):
        assert m == all_meta[j]


def test_embedding_service_zero_rows(rng):
    from multimodal_similarity_tpu.serving import EmbeddingService

    model = build_encoder("rtsn", num_seg=3, emb_dim=16, n_input=8)
    x = rng.randn(2, 3, 8).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    svc = EmbeddingService(model, params, batch_size=4)
    out = svc.embed(np.zeros((0, 3, 8), np.float32))
    assert out.shape == (0, 16)


def test_embedding_service_int8(rng):
    """int8 request path matches the f32 path within quantization error."""
    from multimodal_similarity_tpu.models import build_encoder
    from multimodal_similarity_tpu.serving import EmbeddingService

    model = build_encoder("rtsn", num_seg=3, emb_dim=16, n_input=8)
    x0 = jnp.zeros((2, 3, 8), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0)["params"]
    events = rng.randn(37, 3, 8).astype(np.float32)
    f32 = EmbeddingService(model, params, batch_size=16).embed(events)
    i8 = EmbeddingService(model, params, batch_size=16,
                          int8=True).embed(events)
    assert i8.shape == f32.shape == (37, 16)
    # l2-normalized outputs: quantization error stays small
    assert float(np.max(np.abs(i8 - f32))) < 0.05
    np.testing.assert_allclose(np.linalg.norm(i8, axis=1), 1.0, rtol=1e-2)


def test_embedding_service_embed_quantized(rng):
    """Client-side-quantized requests produce the same embeddings as the
    server-side-quantizing int8 path."""
    from multimodal_similarity_tpu.data.device_feed import quantize_features
    from multimodal_similarity_tpu.models import build_encoder
    from multimodal_similarity_tpu.serving import EmbeddingService

    model = build_encoder("rtsn", num_seg=3, emb_dim=16, n_input=8)
    x0 = jnp.zeros((2, 3, 8), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0)["params"]
    events = rng.randn(21, 3, 8).astype(np.float32)
    svc = EmbeddingService(model, params, batch_size=16, int8=True)
    via_embed = svc.embed(events)
    via_quant = svc.embed_quantized(*quantize_features(events))
    np.testing.assert_allclose(via_embed, via_quant, atol=1e-6)


def test_embedding_service_quantized_zero_rows_and_hot_swap(rng):
    from multimodal_similarity_tpu.data.device_feed import quantize_features
    from multimodal_similarity_tpu.models import build_encoder
    from multimodal_similarity_tpu.serving import EmbeddingService

    model = build_encoder("rtsn", num_seg=3, emb_dim=16, n_input=8)
    x0 = jnp.zeros((2, 3, 8), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0)["params"]
    svc = EmbeddingService(model, params, batch_size=8, int8=True)
    # zero-row request mirrors embed()'s (0, D) contract
    empty = svc.embed_quantized(np.zeros((0, 3, 8), np.int8),
                                np.zeros((0, 3, 1), np.float32))
    assert empty.shape == (16,) or empty.shape == (0, 16)
    assert empty.shape == (0, 16)

    # hot-swapped params apply to BOTH request paths
    events = rng.randn(5, 3, 8).astype(np.float32)
    q, s = quantize_features(events)
    before = svc.embed_quantized(q, s)
    svc.params = model.init(jax.random.PRNGKey(9), x0)["params"]
    after = svc.embed_quantized(q, s)
    assert float(np.max(np.abs(after - before))) > 1e-3
    np.testing.assert_allclose(after, svc.embed(events), atol=1e-6)


def test_retrieval_index_int8_gallery(rng):
    """int8 gallery: top-k matches the exact f32 index to high overlap on
    l2-normalized embeddings (quantization error ~0.4% of row norm)."""
    from multimodal_similarity_tpu.serving import RetrievalIndex

    d = 64
    gal = rng.randn(5000, d).astype(np.float32)
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)
    queries = rng.randn(32, d).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    exact = RetrievalIndex(d)
    exact.add(gal, metadata=list(range(5000)))
    q8 = RetrievalIndex(d, int8_gallery=True)
    q8.add(gal, metadata=list(range(5000)))

    de, ie, _ = exact.query(queries, k=10)
    dq, iq, meta = q8.query(queries, k=10)
    overlap = np.mean([len(set(a) & set(b)) / 10.0
                       for a, b in zip(ie, iq)])
    assert overlap >= 0.95, overlap
    # rank-1 distance error within the quantization bound
    np.testing.assert_allclose(dq[:, 0], de[:, 0], atol=0.02)
    assert meta[0][0] == int(iq[0][0])

    # unsupported combinations fail loudly
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        RetrievalIndex(d, metric="l1", int8_gallery=True)


def test_chunked_topk_quantized_edges(rng):
    """Multi-chunk boundaries, padding rows, and k > N behave like the
    exact scan: padding never wins, overflow slots carry +inf / -1."""
    from multimodal_similarity_tpu.ops.chunked_topk import (
        chunked_topk, chunked_topk_quantized)

    d = 16
    gal = rng.randn(37, d).astype(np.float32)   # 3 chunks of 16 (pad 11)
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)
    amax = np.maximum(np.max(np.abs(gal), axis=1, keepdims=True), 1e-12)
    scale = (amax / 127.0).astype(np.float32)
    qg = np.clip(np.rint(gal / scale), -127, 127).astype(np.int8)
    gsq = (scale.reshape(-1) ** 2) * np.sum(qg.astype(np.float32) ** 2,
                                            axis=1)
    queries = rng.randn(4, d).astype(np.float32)

    d_q, i_q = chunked_topk_quantized(
        jnp.asarray(queries), jnp.asarray(qg), jnp.asarray(scale),
        jnp.asarray(gsq), k=40, chunk=16)
    d_e, i_e = chunked_topk(jnp.asarray(queries),
                            jnp.asarray(gal), k=40, chunk=16)
    d_q, i_q = np.asarray(d_q), np.asarray(i_q)
    # overflow slots (k=40 > N=37) are +inf / -1, exactly like the exact scan
    assert np.all(i_q[:, 37:] == -1) and np.all(d_q[:, 37:] > 1e29)
    # every real slot holds a real gallery row (padding rows never win)
    assert np.all((i_q[:, :37] >= 0) & (i_q[:, :37] < 37))
    # the full ordering matches the exact scan to quantization tolerance
    assert np.mean(i_q[:, :10] == np.asarray(i_e)[:, :10]) > 0.9
    np.testing.assert_allclose(d_q[:, :37],
                               np.asarray(d_e)[:, :37], atol=0.02)


def test_retrieval_index_int8_gallery_sharded(rng):
    """int8 + mesh: quantized shards, local scale-factored distances, ICI
    candidate merge — matches the exact sharded index to high overlap,
    including a gallery size NOT divisible by the mesh (padding rows must
    never win)."""
    from multimodal_similarity_tpu.serving import RetrievalIndex

    mesh = create_mesh(8)
    d = 32
    gal = rng.randn(1003, d).astype(np.float32)   # pad 5 rows to 8 devices
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)
    queries = rng.randn(16, d).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    exact = RetrievalIndex(d, mesh=mesh)
    exact.add(gal)
    q8 = RetrievalIndex(d, mesh=mesh, int8_gallery=True)
    q8.add(gal)
    de, ie, _ = exact.query(queries, k=10)
    dq, iq, _ = q8.query(queries, k=10)
    assert np.all((iq >= 0) & (iq < 1003))        # padding never surfaces
    overlap = np.mean([len(set(a) & set(b)) / 10.0
                       for a, b in zip(ie, iq)])
    assert overlap >= 0.95, overlap
    np.testing.assert_allclose(dq[:, 0], de[:, 0], atol=0.02)


def test_quantized_topk_query_precision_near_ties():
    """The int8 top-k contraction must not lose near-tie rankings to
    query rounding: int8 rows are exact in bf16 and the query rides the
    split-bf16 scheme (ops/chunked_topk.split_bf16_inner), so distances
    match the f32 computation on the SAME quantized rows to ~1e-5 and
    the returned order is the f32 order."""
    import jax.numpy as jnp

    from multimodal_similarity_tpu.ops.chunked_topk import (
        chunked_topk_quantized, split_bf16_inner)

    rng = np.random.RandomState(11)
    n, d = 512, 96
    # integer-valued int8 gallery with many near-duplicate rows (ties
    # broken only by the last few mantissa bits of the query product)
    qg = rng.randint(-127, 128, size=(n, d)).astype(np.int8)
    qg[1::2] = qg[::2]  # pairs of identical rows
    qg[1::2, 0] += 1    # ... off by one quantum
    scale = np.full((n,), 1.0 / 127.0, np.float32)
    g = qg.astype(np.float32) * scale[:, None]
    gsq = np.sum(g * g, axis=1).astype(np.float32)
    q = rng.randn(8, d).astype(np.float32)

    d_got, i_got = chunked_topk_quantized(
        jnp.asarray(q), jnp.asarray(qg), jnp.asarray(scale),
        jnp.asarray(gsq), k=16, chunk=128, metric="squaredeuclidean")
    # f32 oracle on the same quantized rows
    d_exact = ((q ** 2).sum(1, keepdims=True) + gsq[None, :]
               - 2.0 * q @ g.T)
    order = np.argsort(d_exact, axis=1)[:, :16]
    np.testing.assert_allclose(
        np.asarray(d_got),
        np.take_along_axis(d_exact, np.asarray(i_got), axis=1),
        rtol=0, atol=3e-4)
    assert (np.asarray(i_got) == order).mean() > 0.98  # residual 1e-7 ties

    # the split itself: ~f32-accurate vs a plain bf16-query contraction
    inner_split = np.asarray(split_bf16_inner(
        jnp.asarray(q), jnp.asarray(qg).astype(jnp.bfloat16)))
    inner_f32 = q @ qg.astype(np.float32).T
    assert np.max(np.abs(inner_split - inner_f32)) < 2e-2  # |rows| ~ 127
    inner_bf16 = np.asarray(jnp.asarray(q).astype(jnp.bfloat16)
                            @ jnp.asarray(qg).astype(jnp.bfloat16).T,
                            dtype=np.float32)
    assert (np.max(np.abs(inner_split - inner_f32))
            < 0.02 * np.max(np.abs(inner_bf16 - inner_f32)))


def test_retrieval_index_save_load_roundtrip_f32(tmp_path):
    """Kill/reload must serve identical top-k without re-embedding."""
    from multimodal_similarity_tpu.serving import RetrievalIndex

    rng = np.random.RandomState(3)
    g = rng.randn(200, 24).astype(np.float32)
    idx = RetrievalIndex(emb_dim=24, metric="euclidean")
    idx.add(g, metadata=[{"i": i} for i in range(200)])
    q = rng.randn(5, 24).astype(np.float32)
    d0, i0, m0 = idx.query(q, k=7)

    path = idx.save(str(tmp_path / "ix"))
    idx2 = RetrievalIndex.load(path)
    assert len(idx2) == 200
    d1, i1, m1 = idx2.query(q, k=7)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, rtol=0, atol=0)
    assert m0 == m1


def test_retrieval_index_save_load_roundtrip_int8(tmp_path):
    """int8 artifacts reload VERBATIM: top-k is byte-identical and the
    f32 gallery is never rebuilt on the load path."""
    from multimodal_similarity_tpu.serving import RetrievalIndex

    rng = np.random.RandomState(4)
    g = rng.randn(300, 32).astype(np.float32)
    idx = RetrievalIndex(emb_dim=32, metric="squaredeuclidean",
                         int8_gallery=True)
    idx.add(g, metadata=list(range(300)))
    q = rng.randn(4, 32).astype(np.float32)
    d0, i0, _ = idx.query(q, k=9)

    path = idx.save(str(tmp_path / "ix8"))
    idx2 = RetrievalIndex.load(path)
    d1, i1, m1 = idx2.query(q, k=9)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_array_equal(d0, d1)  # byte-identical artifacts
    assert m1[0][0] == int(i1[0][0])
    # the reload path never materialized the f32 gallery
    assert idx2._gallery is None and not idx2._blocks


def test_retrieval_index_load_onto_mesh(tmp_path):
    """An index saved single-chip reloads sharded over a mesh and agrees
    with the single-chip answers (re-sharding at load time)."""
    import jax

    from multimodal_similarity_tpu.parallel import create_mesh
    from multimodal_similarity_tpu.serving import RetrievalIndex
    if jax.device_count() < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    rng = np.random.RandomState(5)
    g = rng.randn(160, 16).astype(np.float32)
    idx = RetrievalIndex(emb_dim=16, int8_gallery=True)
    idx.add(g)
    q = rng.randn(3, 16).astype(np.float32)
    d0, i0, _ = idx.query(q, k=5)
    path = idx.save(str(tmp_path / "ixm"))
    idx2 = RetrievalIndex.load(path, mesh=create_mesh(8))
    d1, i1, _ = idx2.query(q, k=5)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, atol=1e-5)


def test_retrieval_index_save_in_place_over_loaded_dir(tmp_path):
    """Re-saving into the directory the index was load()ed from must not
    truncate the mmap-backed artifacts it is still reading (the
    'reload, then re-save in place' maintenance flow): every file writes
    to a temp name and renames, so the live mmaps keep their old inode."""
    from multimodal_similarity_tpu.serving import RetrievalIndex

    rng = np.random.RandomState(7)
    q = rng.randn(4, 16).astype(np.float32)
    for int8 in (False, True):
        g = rng.randn(120, 16).astype(np.float32)
        idx = RetrievalIndex(emb_dim=16, int8_gallery=int8)
        idx.add(g, metadata=list(range(120)))
        d0, i0, _ = idx.query(q, k=5)
        path = idx.save(str(tmp_path / f"inplace{int8}"))

        loaded = RetrievalIndex.load(path)
        loaded.save(path)  # same dir: sources ARE the mmap files
        d1, i1, _ = RetrievalIndex.load(path).query(q, k=5)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_array_equal(d0, d1)


def test_retrieval_index_add_after_load(tmp_path):
    from multimodal_similarity_tpu.serving import RetrievalIndex

    rng = np.random.RandomState(6)
    g = rng.randn(50, 8).astype(np.float32)
    idx = RetrievalIndex(emb_dim=8, int8_gallery=True)
    idx.add(g)
    path = idx.save(str(tmp_path / "ixa"))
    idx2 = RetrievalIndex.load(path)
    extra = rng.randn(10, 8).astype(np.float32)
    idx2.add(extra, metadata=[f"new{i}" for i in range(10)])
    assert len(idx2) == 60
    # a query exactly at a new row must retrieve it first
    d, i, m = idx2.query(extra[0], k=1)
    assert i[0][0] == 50 and m[0][0] == "new0"


def test_export_index_cli(tmp_path):
    """checkpoint + dataset -> saved index -> reload serves metadata-rich
    top-k with no model (the trainer->serving export workflow)."""
    import jax
    import jax.numpy as jnp

    from multimodal_similarity_tpu.data import generate_synthetic_honda
    from multimodal_similarity_tpu.eval import export_index
    from multimodal_similarity_tpu.models import build_encoder
    from multimodal_similarity_tpu.serving import RetrievalIndex
    from multimodal_similarity_tpu.train.checkpoints import save_pytree

    root = str(tmp_path / "honda")
    generate_synthetic_honda(root, n_sessions=4, frames_per_session=200,
                             modal_dims={"sensors": (8,)}, seed=1)
    model = build_encoder("rtsn", num_seg=3, emb_dim=16, n_input=8)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 3, 8)))["params"]
    ckpt = str(tmp_path / "m.ckpt")
    save_pytree(ckpt, {"params": params})

    out = str(tmp_path / "ix")
    export_index.main([
        "--index_dir", out, "--int8_gallery", "--index_split", "test",
        "--DATA_ROOT", root, "--model_path", ckpt, "--feat", "sensors",
        "--network", "rtsn", "--emb_dim", "16", "--n_input", "8"])
    idx = RetrievalIndex.load(out)
    assert len(idx) > 0 and idx.int8_gallery
    d, i, m = idx.query(np.ones(16, np.float32), k=3)
    assert {"session", "label", "start", "end"} <= set(m[0][0])
