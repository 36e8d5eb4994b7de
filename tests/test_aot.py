"""AOT solver artifacts (utils/aot.py): the serving path must reproduce
the live solve exactly — same trajectory, same bookkeeping — through a
full serialize → bytes → deserialize round trip, with the Result pytree
surface intact."""

import numpy as np
import pytest

import decomp_tpu
from decomp_tpu.utils import aot
from decomp_tpu.utils.exceptions import DecompError
from problems import planted_lasso, planted_nmf, random_mask, rel_err


def test_aot_nmf_roundtrip(tmp_path):
    y, *_ = planted_nmf(seed=1, n_samples=48, n_channels=24, rank=3)
    rng = np.random.default_rng(2)
    d0 = rng.uniform(0.1, 1.0, (3, 24))
    cfg = dict(tol=1e-5, maxiter=200, random_seed=0)

    live = decomp_tpu.nmf.solve(y, d0, **cfg)
    art = aot.export_solver(decomp_tpu.nmf.solve, y, d0, **cfg)
    path = tmp_path / "nmf.dtaot"
    art.save(path)
    loaded = aot.load_solver(path)

    res = loaded(y, d0)
    assert isinstance(res, decomp_tpu.NMFResult)
    assert int(res.niter) == int(live.niter)
    assert bool(res.converged) == bool(live.converged)
    assert rel_err(res.x, live.x) == 0.0
    assert rel_err(res.d, live.d) == 0.0
    # the call contract is pinned and inspectable
    assert loaded.in_avals[0].shape == y.shape


def test_aot_lasso_per_problem_masked_roundtrip():
    y, a, _ = planted_lasso(seed=3, n_samples=24, n_features=12,
                            n_channels=16)
    mask = random_mask(4, y.shape)
    cfg = dict(tol=1e-5, maxiter=150, method="acc_ista",
               per_problem=True)

    # the mask ships as a per-request input (an example arg via a
    # wrapper), not a baked constant
    def entry(y, a, mask):
        return decomp_tpu.lasso.solve(y, a, 0.1, mask=mask, **cfg)

    live = entry(y * mask, a, mask)
    loaded = aot.load_solver(
        aot.export_solver(entry, y, a, mask).serialize())
    res = loaded(y * mask, a, mask)
    assert isinstance(res, decomp_tpu.LassoResult)
    np.testing.assert_array_equal(np.asarray(res.niter),
                                  np.asarray(live.niter))
    np.testing.assert_array_equal(np.asarray(res.converged),
                                  np.asarray(live.converged))
    assert rel_err(res.x, live.x) == 0.0


def test_aot_dictionary_learning_roundtrip():
    from problems import planted_patches
    y, d_true, _ = planted_patches(seed=5, n_samples=40)
    rng = np.random.default_rng(6)
    d0 = d_true + 0.3 * rng.normal(size=d_true.shape)
    cfg = dict(tol=0.0, maxiter=5, lasso_iter=4, lasso_tol=0.0)

    live = decomp_tpu.dictionary_learning.solve(y, d0, 0.05, **cfg)
    loaded = aot.load_solver(aot.export_solver(
        decomp_tpu.dictionary_learning.solve, y, d0, 0.05,
        **cfg).serialize())
    res = loaded(y, d0, 0.05)
    assert isinstance(res, decomp_tpu.DictionaryLearningResult)
    assert rel_err(res.d, live.d) == 0.0
    assert rel_err(res.x, live.x) == 0.0


def test_aot_masked_completion_preset_roundtrip():
    """The preset returns aux (held-out error) — the nested pytree must
    survive the dict round trip."""
    y, *_ = planted_nmf(seed=7, n_samples=64, n_channels=32, rank=3)
    mask = random_mask(8, y.shape)
    cfg = dict(rank=3, tol=1e-3, maxiter=400, random_seed=1, mixed=False)

    live = decomp_tpu.nmf.masked_completion(y * mask, mask, **cfg)
    loaded = aot.load_solver(aot.export_solver(
        decomp_tpu.nmf.masked_completion, y * mask, mask,
        **cfg).serialize())
    res = loaded(y * mask, mask)
    assert int(res.niter) == int(live.niter)
    assert res.aux is not None and "heldout_rel_err" in res.aux
    np.testing.assert_allclose(np.asarray(res.aux["heldout_rel_err"]),
                               np.asarray(live.aux["heldout_rel_err"]))
    assert rel_err(res.x, live.x) == 0.0


def test_aot_shape_dtype_struct_specs_and_baked_config():
    """Export from specs alone (no example data), with the dictionary
    baked into the artifact as a constant via a closure."""
    import jax
    import jax.numpy as jnp

    y, a, _ = planted_lasso(seed=9, n_samples=16, n_features=8,
                            n_channels=12)
    a_dev = jnp.asarray(a)

    def entry(y):
        return decomp_tpu.lasso.solve(y, a_dev, 0.1, tol=1e-5,
                                      maxiter=100, method="fista")

    live = entry(y)
    loaded = aot.load_solver(aot.export_solver(
        entry, jax.ShapeDtypeStruct(y.shape, jnp.float64)).serialize())
    res = loaded(y)
    assert rel_err(res.x, live.x) == 0.0


def test_aot_split_complex_roundtrip():
    """solve_split artifacts carry the SplitComplex pytree across the
    export boundary in both directions (registered namedtuple
    serialization)."""
    import jax.numpy as jnp

    from decomp_tpu.ops import complex_split as cs

    rng = np.random.default_rng(13)
    m, f, c = 16, 8, 12
    a = (rng.normal(size=(f, c))
         + 1j * rng.normal(size=(f, c))).astype(np.complex64)
    y = (rng.normal(size=(m, c))
         + 1j * rng.normal(size=(m, c))).astype(np.complex64)
    ys = cs.SplitComplex(jnp.asarray(y.real), jnp.asarray(y.imag))
    a_s = cs.SplitComplex(jnp.asarray(a.real), jnp.asarray(a.imag))
    cfg = dict(tol=1e-5, maxiter=60, method="fista")

    live = decomp_tpu.lasso.solve_split(ys, a_s, 0.1, **cfg)
    loaded = aot.load_solver(aot.export_solver(
        decomp_tpu.lasso.solve_split, ys, a_s, 0.1, **cfg).serialize())
    res = loaded(ys, a_s, 0.1)
    assert isinstance(res.x, cs.SplitComplex)
    assert rel_err(np.asarray(res.x.re), np.asarray(live.x.re)) == 0.0
    assert rel_err(np.asarray(res.x.im), np.asarray(live.x.im)) == 0.0
    assert int(res.niter) == int(live.niter)


def test_aot_sharded_solve_roundtrip():
    """parallel solvers export too: the artifact pins the mesh topology
    (8 devices here) and reloads in any process with a matching device
    count; request inputs must be device_put with the mesh sharding."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from decomp_tpu import parallel

    rng = np.random.default_rng(11)
    y = rng.uniform(0.1, 1.0, (64, 32))
    d0 = rng.uniform(0.1, 1.0, (4, 32))
    mesh = parallel.make_mesh((8,), ("rows",))
    cfg = dict(mesh=mesh, tol=0.0, maxiter=12)

    live = parallel.nmf.solve(y, d0, **cfg)
    loaded = aot.load_solver(aot.export_solver(
        parallel.nmf.solve, y, d0, **cfg).serialize())
    ys = jax.device_put(y, NamedSharding(mesh, P("rows", None)))
    ds = jax.device_put(d0, NamedSharding(mesh, P(None, None)))
    res = loaded(ys, ds)
    assert rel_err(res.x, live.x) == 0.0
    assert rel_err(res.d, live.d) == 0.0


def test_aot_multislice_tuple_axis_roundtrip():
    """Hierarchical (tuple-axis) sharded solves export too: the artifact
    pins the full ('slice', 'rows') mesh topology and the hierarchical
    psums serialize like any other collective. Round-5 combination
    coverage: AOT × multi-slice."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from decomp_tpu import parallel

    rng = np.random.default_rng(17)
    y = rng.uniform(0.1, 1.0, (64, 32))
    d0 = rng.uniform(0.1, 1.0, (4, 32))
    mesh = parallel.make_mesh((2, 4), ("slice", "rows"))
    cfg = dict(mesh=mesh, row_axis=("slice", "rows"), tol=1e-5,
               maxiter=40)

    live = parallel.nmf.solve(y, d0, **cfg)
    loaded = aot.load_solver(aot.export_solver(
        parallel.nmf.solve, y, d0, **cfg).serialize())
    ys = jax.device_put(y, NamedSharding(mesh, P(("slice", "rows"),
                                                 None)))
    ds = jax.device_put(d0, NamedSharding(mesh, P(None, None)))
    res = loaded(ys, ds)
    assert int(res.niter) == int(live.niter)
    assert rel_err(res.x, live.x) == 0.0
    assert rel_err(res.d, live.d) == 0.0


def test_aot_multi_platform_artifact():
    """platforms=('cpu','tpu') lowers one artifact for both backends;
    calling it on the CPU backend reproduces the live solve."""
    import jax.numpy as jnp

    y, *_ = planted_nmf(seed=15, n_samples=32, n_channels=16, rank=3)
    rng = np.random.default_rng(16)
    d0 = rng.uniform(0.1, 1.0, (3, 16))
    cfg = dict(tol=0.0, maxiter=10)

    live = decomp_tpu.nmf.solve(y, d0, **cfg)
    loaded = aot.load_solver(aot.export_solver(
        decomp_tpu.nmf.solve, y, d0, platforms=("cpu", "tpu"),
        **cfg).serialize())
    assert set(loaded.platforms) == {"cpu", "tpu"}
    res = loaded(y, d0)
    assert bool(jnp.array_equal(res.x, live.x))


def test_aot_rejects_garbage_and_non_result_functions(tmp_path):
    with pytest.raises(DecompError, match="bad magic"):
        aot.load_solver(b"not an artifact")
    p = tmp_path / "junk.bin"
    p.write_bytes(b"DTAOT1\n{\"result_cls\": \"nope\"}\n")
    with pytest.raises(DecompError, match="unknown result class"):
        aot.load_solver(p)
    with pytest.raises(DecompError, match="Result pytree"):
        aot.export_solver(lambda y: y * 2.0, np.ones((3, 3)))
