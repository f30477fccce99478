import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enflow_tpu.sample import (
    ais,
    dual_averaging_warmup,
    ess_from_log_weights,
    hmc_kernel,
    mala_kernel,
    run_hmc,
    smc,
    systematic_resample,
    targets,
)

DTYPE = jnp.float64


def test_ess():
    lw = jnp.zeros(100)
    assert float(ess_from_log_weights(lw)) == pytest.approx(100.0)
    lw = jnp.asarray([0.0] + [-1e10] * 99)
    assert float(ess_from_log_weights(lw)) == pytest.approx(1.0)


def test_systematic_resample_proportional():
    w = jnp.asarray([0.5, 0.25, 0.125, 0.125])
    idx = systematic_resample(jax.random.PRNGKey(0), jnp.log(w), n=1000)
    counts = np.bincount(np.asarray(idx), minlength=4) / 1000
    np.testing.assert_allclose(counts, np.asarray(w), atol=0.01)


def test_hmc_gaussian_moments():
    target = targets.gaussian((4,), std=2.0)
    x0 = jnp.zeros((64, 4), DTYPE)
    res = run_hmc(jax.random.PRNGKey(0), x0, target.log_prob,
                  n_samples=300, n_warmup=50, step_size=0.5, n_leapfrog=8)
    assert float(res.accept_rate) > 0.6
    samples = np.asarray(res.samples)  # [300, 64, 4]
    assert abs(samples.mean()) < 0.1
    assert samples.var() == pytest.approx(4.0, rel=0.1)


def test_dual_averaging_targets_acceptance():
    target = targets.gaussian((6,), std=1.0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (32, 6), DTYPE)
    eps, x = dual_averaging_warmup(jax.random.PRNGKey(2), x0, target.log_prob,
                                   n_adapt=150, n_leapfrog=5,
                                   target_accept=0.65, init_step_size=1.5)
    # measure acceptance at the adapted step size
    res = run_hmc(jax.random.PRNGKey(3), x, target.log_prob, n_samples=100,
                  step_size=eps, n_leapfrog=5)
    assert 0.45 < float(res.accept_rate) < 0.95


def test_mala_moves_and_accepts():
    target = targets.gaussian((3,), std=1.0)
    x = jax.random.normal(jax.random.PRNGKey(4), (3,), DTYPE) + 5.0
    accepted = 0
    for i in range(200):
        x, acc = mala_kernel(jax.random.fold_in(jax.random.PRNGKey(5), i), x,
                             target.log_prob, 0.1)
        accepted += int(acc)
    assert accepted > 100
    assert np.linalg.norm(np.asarray(x)) < 4.0  # drifted toward the mode


@pytest.mark.parametrize("algo", [smc, ais])
def test_annealing_gaussian_logz(algo):
    """Anneal N(0,1) -> N(0, 0.5^2) in d=3: log(Z_p/Z_q) = 3*log(0.5)."""
    d, P = 3, 512
    log_q0 = lambda x: -0.5 * (x**2).sum()
    log_p = lambda x: -0.5 * (x**2).sum() / 0.25
    x0 = jax.random.normal(jax.random.PRNGKey(6), (P, d), DTYPE)
    res = algo(jax.random.PRNGKey(7), x0, log_q0=log_q0, log_p=log_p,
               n_temps=12, mcmc_steps=2, step_size=0.3, n_leapfrog=5)
    expect = d * np.log(0.5)
    assert float(res.log_Z) == pytest.approx(expect, abs=0.1)
    # particle variance matches the target (weighted for AIS)
    w = np.exp(np.asarray(res.log_weights
                          - jax.scipy.special.logsumexp(res.log_weights)))
    x = np.asarray(res.particles)
    var = (w[:, None] * x**2).sum() / d
    assert var == pytest.approx(0.25, rel=0.2)
    assert np.isfinite(np.asarray(res.ess_history)).all()


@pytest.mark.parametrize("algo", [smc, ais])
def test_annealing_no_mcmc(algo):
    """mcmc_steps=0 (plain annealed IS / SMC without rejuvenation) stays
    supported and never computes density gradients (the value-only cache
    path): logZ on the exact-Gaussian pair remains unbiased, acceptance
    history is all zeros."""
    d, P = 3, 1024
    log_q0 = lambda x: -0.5 * (x**2).sum()
    log_p = lambda x: -0.5 * (x**2).sum() / 0.25
    x0 = jax.random.normal(jax.random.PRNGKey(40), (P, d), DTYPE)
    res = jax.jit(lambda k, x: algo(k, x, log_q0=log_q0, log_p=log_p,
                                    n_temps=24, mcmc_steps=0))(
        jax.random.PRNGKey(41), x0)
    expect = d * np.log(0.5)
    assert float(res.log_Z) == pytest.approx(expect, abs=0.15)
    assert np.asarray(res.accept_history).max() == 0.0


@pytest.mark.parametrize("algo", [smc, ais])
def test_annealing_f32_particles_under_x64(algo):
    """f32 particle states must survive the anneal untouched even when the
    beta schedule is strongly-typed f64 (x64 mode, as here): the HMC tree
    ops cast scalar coefficients per leaf instead of promoting the carry."""
    t = targets.lj_cluster(4, kBT=2.0)
    x0 = 1.2 * jax.random.normal(jax.random.PRNGKey(30), (16, 4, 3),
                                 jnp.float32)
    log_q0 = lambda x: -0.5 * (x**2).sum() / 1.44
    res = algo(jax.random.PRNGKey(31), x0, log_q0=log_q0, log_p=t.log_prob,
               n_temps=3, mcmc_steps=1, step_size=0.02, n_leapfrog=2)
    assert res.particles.dtype == jnp.float32
    assert np.isfinite(float(res.log_Z))


@pytest.mark.parametrize("eps0", [0.2, 5.0])
def test_adapt_step_recovers_from_bad_step_size(eps0):
    """adapt_step=True pulls a mis-tuned step size toward the target
    acceptance from either side (too small -> accept ~1 -> grows; too
    large -> accept ~0 -> shrinks). Measured equilibria: eps 0.2 -> 1.48
    and 5.0 -> 1.31 with tail acceptance ~0.6, where the fixed-step
    control sits at 0.994 / 0.0."""
    t = targets.gaussian((4,), std=1.0)
    P = 256
    x0 = 2.0 * jax.random.normal(jax.random.PRNGKey(40), (P, 4), DTYPE)
    log_q0 = lambda x: -0.125 * (x ** 2).sum()   # N(0, 2^2) up to const
    res = smc(jax.random.PRNGKey(41), x0, log_q0=log_q0, log_p=t.log_prob,
              n_temps=20, mcmc_steps=2, step_size=eps0, n_leapfrog=5,
              adapt_step=True)
    acc_tail = float(np.asarray(res.accept_history)[-4:].mean())
    assert 0.35 < acc_tail < 0.9, acc_tail
    eps_final = float(np.asarray(res.step_history)[-1])
    assert 0.8 < eps_final < 2.5, eps_final
    # fixed-step control really is degenerate at these step sizes
    res_fixed = smc(jax.random.PRNGKey(41), x0, log_q0=log_q0,
                    log_p=t.log_prob, n_temps=20, mcmc_steps=2,
                    step_size=eps0, n_leapfrog=5)
    acc_fixed = float(np.asarray(res_fixed.accept_history)[-4:].mean())
    assert acc_fixed > 0.98 or acc_fixed < 0.05


def test_precondition_fixes_anisotropic_target():
    """Diagonal ensemble-std mass: on a strongly anisotropic Gaussian
    (stds 8..0.125) a single global step size either stalls the wide
    directions or rejects on the narrow ones; preconditioned HMC mixes
    all of them. Check second moments per dimension against the target."""
    stds = jnp.asarray([8.0, 1.0, 0.5, 0.125], DTYPE)
    t = targets.gaussian((4,), std=stds)
    P = 1024
    # proposal: isotropic N(0, 10^2), overdispersed in every dimension
    x0 = 10.0 * jax.random.normal(jax.random.PRNGKey(50), (P, 4), DTYPE)
    log_q0 = lambda x: -0.5 * (x ** 2).sum() / 100.0

    def second_moments(precondition):
        res = smc(jax.random.PRNGKey(51), x0, log_q0=log_q0,
                  log_p=t.log_prob, n_temps=24, mcmc_steps=2,
                  step_size=0.3, n_leapfrog=5, adapt_step=True,
                  precondition=precondition)
        lw = res.log_weights - jax.scipy.special.logsumexp(res.log_weights)
        return (jnp.exp(lw)[:, None] * res.particles ** 2).sum(axis=0)

    m2 = second_moments(True)
    # measured: [61.4, 1.04, 0.252, 0.0151] vs target [64, 1, 0.25, 0.0156]
    np.testing.assert_allclose(np.asarray(m2), np.asarray(stds) ** 2,
                               rtol=0.2)
    # the wide dimension specifically: the unpreconditioned sampler's one
    # adapted step size is pulled to the narrow dims and undermixes x0
    # (measured 50.9 vs 61.4 preconditioned, target 64)
    m2_wide_un = float(second_moments(False)[0])
    assert abs(float(m2[0]) - 64.0) < abs(m2_wide_un - 64.0) - 1e-6


def test_flow_pushforward_density_self_normalized():
    """Sharpest check that the flow-proposal density uses the TRUE log-det:
    with proposal q0 = pushforward of N(0,I) through the flow (a normalized
    density by construction) and target p = N(0,I) (normalized), AIS's
    log_Z = log(Z_p / Z_q0) must be ~0. The NLL-parity ldj (Q.sum instead of
    3*Q.sum) makes q0 effectively unnormalized and shifts log_Z by
    E[2*sum(Q)] — made large here by biasing the velocity-scaling head."""
    from enflow_tpu.data.system import System
    from enflow_tpu.flow import FlowConfig, init_flow, forward_core, \
        reverse_core
    from enflow_tpu.nn.egcl import EGCLConfig

    n_atoms, nf, n_iter = 2, 2, 2
    params = init_flow(
        jax.random.PRNGKey(0),
        FlowConfig(n_iter=n_iter, dt=0.05,
                   egcl=EGCLConfig(node_nf=nf, hidden_nf=8),
                   nbr_mode="all_pairs"), DTYPE)
    # push Q away from 0 so the parity-vs-exact difference is macroscopic
    # (kept mild: the importance weights must stay light-tailed for the
    # finite-P logmeanexp to resolve the offset)
    params["networks"]["vel_scaling_nn"][1]["b"] = (
        params["networks"]["vel_scaling_nn"][1]["b"] + 0.1)

    mask = jnp.ones((1, n_atoms), bool)
    box = jnp.full((1, 3), 1e3, DTYPE)
    r_cut = jnp.full((1,), 1e2, DTYPE)

    def to_system(x):
        return System(h=x["h"][None], g=x["g"][None], pos=x["pos"][None],
                      vel=x["vel"][None], mask=mask, box=box, r_cut=r_cut)

    def gauss(s):
        tot = 0.0
        for f in (s.h, s.g, s.pos, s.vel):
            tot = tot + (f * f).sum()
        return -0.5 * tot        # unnormalized is fine: constants cancel in
                                 # log(Z_p/Z_q0) when used for BOTH densities

    def log_p(x):
        return gauss(to_system(x))

    def make_log_q0(exact):
        import dataclasses as dc
        cfg = FlowConfig(n_iter=n_iter, dt=0.05,
                         egcl=EGCLConfig(node_nf=nf, hidden_nf=8),
                         nbr_mode="all_pairs", exact_ldj=exact)

        def log_q0(x):
            out, ldj = forward_core(params, cfg, to_system(x))
            return gauss(out) + ldj[0]
        return cfg, log_q0

    cfg_e, log_q0_exact = make_log_q0(True)
    _, log_q0_parity = make_log_q0(False)

    P = 8192
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    z = {"h": jax.random.normal(ks[0], (P, n_atoms, nf), DTYPE),
         "g": jax.random.normal(ks[1], (P, n_atoms, nf), DTYPE),
         "pos": jax.random.normal(ks[2], (P, n_atoms, 3), DTYPE),
         "vel": jax.random.normal(ks[3], (P, n_atoms, 3), DTYPE)}
    x0 = jax.vmap(lambda zz: jax.tree_util.tree_map(
        lambda a: a[0], dict(zip(("h", "g", "pos", "vel"),
                                 (lambda s: (s.h, s.g, s.pos, s.vel))(
                                     reverse_core(params, cfg_e,
                                                  to_system(zz))[0])))))(z)

    def logz(log_q0):
        res = ais(jax.random.PRNGKey(2), x0, log_q0=log_q0, log_p=log_p,
                  n_temps=8, mcmc_steps=2, step_size=0.1, n_leapfrog=3)
        return float(res.log_Z)

    z_exact, z_parity = logz(log_q0_exact), logz(log_q0_parity)
    # measured: exact -0.12 (finite-P AIS noise around 0), parity +2.19
    # (the dropped 2*sum(Q) volume term, macroscopic by construction)
    assert abs(z_exact) < 0.3, z_exact
    assert z_parity > 1.0, z_parity


def test_lj_cluster_traced_softening_zero_no_nan():
    """With a *traced* softening (annealing schedules), the softened branch
    runs even at s == 0 — coincident atoms must not produce inf - inf = NaN
    (the NLL's d2 != 0 guard, applied here too)."""
    t = targets.lj_cluster(4, kBT=1.0)
    x = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0],   # coincident pair
                     [1.2, 0.0, 0.0], [0.0, 1.2, 0.0]])

    lp = jax.jit(lambda x, s: t.log_prob(x, softening=s))
    assert np.isfinite(float(lp(x, 0.0)))
    assert np.isfinite(float(lp(x, 0.1)))
    g = jax.jit(jax.grad(lambda x, s: t.log_prob(x, softening=s)))(x, 0.0)
    assert np.isfinite(np.asarray(g)[2:]).all()  # separated atoms' grads

    # with softening > 0 the coincident pair must KEEP its finite softened
    # repulsion (4*(1/s^6 - 1/s^3)/kBT): dropping it would hand collapsed
    # configurations energy 0
    x_sep = x.at[1].set(jnp.asarray([0.0, 0.0, 1.1]))
    pair_energy = 4.0 * (0.1 ** -6 - 0.1 ** -3)
    got = float(lp(x_sep, 0.1)) - float(lp(x, 0.1))
    # the coincident config also gains softened energy on its OTHER pair
    # distances; compare against the dominant 1/s^6 term loosely
    assert got > 0.5 * pair_energy, (got, pair_energy)


def test_smc_lj13_smoke():
    """Flow-SMC shape: 13-atom LJ cluster target from a Gaussian proposal."""
    t = targets.lj_cluster(13, kBT=2.0)
    P = 128
    x0 = 1.5 * jax.random.normal(jax.random.PRNGKey(8), (P, 13, 3), DTYPE)
    log_q0 = lambda x: -0.5 * (x**2).sum() / 1.5**2
    res = jax.jit(lambda k, x: smc(k, x, log_q0=log_q0, log_p=t.log_prob,
                                   n_temps=8, mcmc_steps=1, step_size=0.02,
                                   n_leapfrog=3))(jax.random.PRNGKey(9), x0)
    assert np.isfinite(float(res.log_Z))
    assert np.isfinite(np.asarray(res.particles)).all()
    # energies should have dropped well below the Gaussian cloud's
    from enflow_tpu.sim import lj_energy
    e = jax.vmap(lambda x: lj_energy(x))(res.particles)
    e0 = jax.vmap(lambda x: lj_energy(x))(x0)
    assert float(jnp.median(e)) < float(jnp.median(e0))


def test_flow_reverse_core_ldj_consistency():
    """reverse_core's ldj is exactly minus the forward ldj (flow-proposal
    density bookkeeping)."""
    from enflow_tpu.flow import FlowConfig, init_flow, forward_core, reverse_core
    from enflow_tpu.nn.egcl import EGCLConfig
    from tests.test_flow import make_onehot_system

    rng = np.random.default_rng(10)
    sys0 = make_onehot_system(rng, B=3, N=5)
    cfg = FlowConfig(n_iter=2, dt=0.05,
                     egcl=EGCLConfig(node_nf=5, hidden_nf=8))
    params = init_flow(jax.random.PRNGKey(11), cfg, DTYPE)
    out, ldj_f = forward_core(params, cfg, sys0)
    back, ldj_r = reverse_core(params, cfg, out)
    np.testing.assert_allclose(np.asarray(ldj_r), -np.asarray(ldj_f),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(back.pos), np.asarray(sys0.pos),
                               atol=1e-9)


def test_adaptive_tempering_logz_and_schedule():
    """Adaptive beta selection reaches beta=1 and keeps the logZ estimate."""
    d, P = 3, 512
    log_q0 = lambda x: -0.5 * (x**2).sum()
    log_p = lambda x: -0.5 * (x**2).sum() / 0.25
    x0 = jax.random.normal(jax.random.PRNGKey(20), (P, d), DTYPE)
    res = smc(jax.random.PRNGKey(21), x0, log_q0=log_q0, log_p=log_p,
              n_temps=15, adaptive=True, target_ess_frac=0.6,
              mcmc_steps=2, step_size=0.3, n_leapfrog=5)
    betas = np.asarray(res.beta_history)
    assert (np.diff(betas) >= -1e-12).all()          # monotone
    assert betas[-1] == pytest.approx(1.0, abs=1e-6)  # reaches the target
    expect = d * np.log(0.5)
    assert float(res.log_Z) == pytest.approx(expect, abs=0.1)
    # the adaptive schedule keeps per-step ESS near the target until beta=1
    active = betas < 1.0 - 1e-9
    if active[:-1].any():
        assert np.asarray(res.ess_history)[1:][active[:-1]].min() > 0.4 * P


def test_smc_moments_match_hmc_ground_truth():
    """Posterior-moment parity (the BASELINE quality criterion): SMC and
    long-run HMC must agree on energy and radius-of-gyration moments within
    Monte-Carlo error on a small LJ cluster."""
    from enflow_tpu.sim import lj_energy

    t = targets.lj_cluster(6, kBT=2.0)
    n = 6

    # ground truth: HMC
    from enflow_tpu.sim import minimize_fire

    raw = 1.2 * jax.random.normal(jax.random.PRNGKey(30), (32, n, 3), DTYPE)
    # relax overlapped random inits so no chain starts inside the LJ wall
    x0 = jax.vmap(lambda p: minimize_fire(
        p, lambda q: -t.log_prob(q), n_steps=200))(raw).reshape(32, -1)
    lp_flat = lambda q: t.log_prob(q.reshape(n, 3))
    eps, x0 = dual_averaging_warmup(jax.random.PRNGKey(34), x0, lp_flat,
                                    n_adapt=150, n_leapfrog=10,
                                    init_step_size=0.05)
    hmc = run_hmc(jax.random.PRNGKey(31), x0, lp_flat,
                  n_samples=600, n_warmup=100, step_size=eps, n_leapfrog=10)
    assert float(hmc.accept_rate) > 0.5
    hmc_pos = np.asarray(hmc.samples).reshape(-1, n, 3)[::3]

    # SMC from a Gaussian proposal
    P = 512
    xs = 1.2 * jax.random.normal(jax.random.PRNGKey(32), (P, n, 3), DTYPE)
    log_q0 = lambda x: -0.5 * (x**2).sum() / 1.44
    res = smc(jax.random.PRNGKey(33), xs, log_q0=log_q0, log_p=t.log_prob,
              n_temps=12, adaptive=True, mcmc_steps=2, step_size=0.05,
              n_leapfrog=5)
    assert float(res.beta_history[-1]) > 1 - 1e-6
    w = np.exp(np.asarray(res.log_weights))
    w /= w.sum()
    smc_pos = np.asarray(res.particles)

    def stats(pos, w=None):
        e = np.asarray(jax.vmap(lambda x: lj_energy(x))(jnp.asarray(pos)))
        com = pos.mean(axis=1, keepdims=True)
        rg = np.sqrt(((pos - com)**2).sum(-1).mean(-1))
        if w is None:
            w = np.ones(len(pos)) / len(pos)
        return ((w * e).sum(), (w * rg).sum())

    he, hr = stats(hmc_pos)
    se, sr = stats(smc_pos, w)
    # loose MC-error tolerances for CI scale
    assert se == pytest.approx(he, abs=1.5)
    assert sr == pytest.approx(hr, rel=0.08)


@pytest.mark.parametrize("algo", [smc, ais])
def test_annealing_batched_densities(algo):
    """``batched=True``: densities map [P, ...] -> [P] in one program (VJP
    ones-cotangent gradients, batched tempered-HMC kernel). Same exact-
    Gaussian logZ and target moments as the vmapped path."""
    d, P = 3, 512
    log_q0 = lambda x: -0.5 * (x**2).sum(axis=-1)
    log_p = lambda x: -0.5 * (x**2).sum(axis=-1) / 0.25
    x0 = jax.random.normal(jax.random.PRNGKey(6), (P, d), DTYPE)
    res = jax.jit(lambda k, x: algo(
        k, x, log_q0=log_q0, log_p=log_p, n_temps=12, mcmc_steps=2,
        step_size=0.3, n_leapfrog=5, batched=True))(
            jax.random.PRNGKey(7), x0)
    expect = d * np.log(0.5)
    assert float(res.log_Z) == pytest.approx(expect, abs=0.1)
    w = np.exp(np.asarray(res.log_weights
                          - jax.scipy.special.logsumexp(res.log_weights)))
    x = np.asarray(res.particles)
    var = (w[:, None] * x**2).sum() / d
    assert var == pytest.approx(0.25, rel=0.2)
    assert 0.3 < float(np.asarray(res.accept_history).mean()) <= 1.0


def test_batched_value_and_grad_matches_vmap():
    from enflow_tpu.sample.mcmc import batched_value_and_grad

    f_single = lambda x: -0.5 * (x**2).sum() + jnp.sin(x).prod()
    f_batched = lambda x: (-0.5 * (x**2).sum(axis=(1, 2))
                           + jnp.sin(x).prod(axis=(1, 2)))
    x = jax.random.normal(jax.random.PRNGKey(8), (7, 4, 3), DTYPE)
    v1, g1 = jax.vmap(jax.value_and_grad(f_single))(x)
    v2, g2 = batched_value_and_grad(f_batched)(x)
    np.testing.assert_allclose(v2, v1, rtol=1e-12)
    np.testing.assert_allclose(g2, g1, rtol=1e-12)


# ---------------------------------------------------------------------------
# chunked/segmented SMC (fault-tolerant long runs, VERDICT r3 item 4)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("adaptive", [False, True])
def test_smc_segments_matches_monolithic(adaptive):
    """Chunked execution == one monolithic scan, bitwise (same key): the
    segments apply the identical anneal-step transition to the identical
    (betas, betas_prev, keys) slices."""
    from enflow_tpu.sample.smc import smc_segments

    target = targets.gaussian((4,), std=1.6)
    x0 = 1.6 * jax.random.normal(jax.random.PRNGKey(0), (32, 4), DTYPE)
    log_q0 = lambda x: -0.5 * (x ** 2).sum() / (1.6 ** 2)
    kw = dict(log_q0=log_q0, log_p=target.log_prob, n_temps=7, mcmc_steps=1,
              step_size=0.3, n_leapfrog=3, adaptive=adaptive,
              target_ess_frac=0.8)
    key = jax.random.PRNGKey(5)

    mono = jax.jit(lambda k, x: smc(k, x, **kw))(key, x0)
    seg = smc_segments(key, x0, chunk_temps=3, **kw)

    np.testing.assert_array_equal(np.asarray(seg.log_weights),
                                  np.asarray(mono.log_weights))
    np.testing.assert_array_equal(np.asarray(seg.log_Z),
                                  np.asarray(mono.log_Z))
    np.testing.assert_array_equal(np.asarray(seg.ess_history),
                                  np.asarray(mono.ess_history))
    np.testing.assert_array_equal(np.asarray(seg.beta_history),
                                  np.asarray(mono.beta_history))
    for k in ("particles",):
        np.testing.assert_array_equal(np.asarray(getattr(seg, k)),
                                      np.asarray(getattr(mono, k)))


def test_smc_segments_resume_and_hooks():
    """A run killed after segment 1 resumes from the on_segment-captured
    state and finishes bitwise-identical to the uninterrupted run; the
    run_segment executor sees every dispatch (retry hook)."""
    from enflow_tpu.sample.smc import smc_segments

    target = targets.gaussian((3,), std=1.2)
    x0 = 1.2 * jax.random.normal(jax.random.PRNGKey(1), (16, 3), DTYPE)
    log_q0 = lambda x: -0.5 * (x ** 2).sum() / (1.2 ** 2)
    kw = dict(log_q0=log_q0, log_p=target.log_prob, n_temps=6, mcmc_steps=1,
              step_size=0.3, n_leapfrog=2)
    key = jax.random.PRNGKey(9)

    full = smc_segments(key, x0, chunk_temps=2, **kw)

    captured = {}

    def grab(j, state, hists):
        if j == 2:
            captured["stage"] = j
            captured["state"] = jax.tree_util.tree_map(np.asarray, state)
            captured["hists"] = jax.tree_util.tree_map(np.asarray, hists)

    calls = {"n": 0}

    def counting(f, *a):
        calls["n"] += 1
        return f(*a)

    smc_segments(key, x0, chunk_temps=2, on_segment=grab,
                 run_segment=counting, **kw)
    assert calls["n"] == 4                    # init + 3 segments
    assert captured["stage"] == 2

    resumed = smc_segments(
        key, None, chunk_temps=2, start_stage=captured["stage"],
        init_state=jax.tree_util.tree_map(jnp.asarray, captured["state"]),
        init_hists=[tuple(jnp.asarray(a) for a in h)
                    for h in captured["hists"]], **kw)
    np.testing.assert_array_equal(np.asarray(resumed.log_weights),
                                  np.asarray(full.log_weights))
    np.testing.assert_array_equal(np.asarray(resumed.log_Z),
                                  np.asarray(full.log_Z))
    np.testing.assert_array_equal(np.asarray(resumed.ess_history),
                                  np.asarray(full.ess_history))


def test_lj_cluster_e_cap_keeps_target_proper():
    """e_cap regularizes the PAIR energy only: with the cap active, the
    density must still fall off harmonically at large radius (a total-
    energy log-cap made the target improper, and the first LJ55
    coupled-flow VI run exploited it to Rg ~ 1e17 — see targets.py)."""
    t = targets.lj_cluster(13, kBT=2.0, c_osc=0.5, e_cap=100.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(13, 3)))
    lp_near = t.log_prob(2.0 * x)          # spread but ordinary radius
    lp_far = t.log_prob(100.0 * x)         # far field
    lp_farther = t.log_prob(200.0 * x)
    # harmonic decay: quadrupling the radius quarters ~nothing — the
    # log-density must drop by ~c_osc * (R2^2 - R1^2) * sum|x-com|^2 / kBT
    com = x - x.mean(0, keepdims=True)
    s2 = float((com ** 2).sum())
    drop = float(lp_far - lp_farther)
    expected = 0.5 * (200.0 ** 2 - 100.0 ** 2) * s2 / 2.0
    assert drop == pytest.approx(expected, rel=1e-3)
    assert float(lp_near) > float(lp_far) > float(lp_farther)
    # overlap guard still works: coincident-ish pair is capped, not inf
    y = x.at[1].set(x[0] + 1e-4)
    assert np.isfinite(float(t.log_prob(y)))


def test_lj_cluster_e_cap_pair_only_sharded_parity():
    """The sharded body mirrors the pair-only cap exactly."""
    import os
    if jax.device_count() < 2:
        pytest.skip("needs multi-device mesh")
    from enflow_tpu.parallel.mesh import get_mesh
    from jax.sharding import PartitionSpec as P

    n = 8
    t = targets.lj_cluster(n, kBT=2.0, c_osc=0.5, e_cap=50.0)
    rng = np.random.default_rng(1)
    # far-field configs where cap-placement changes the answer
    pos = jnp.asarray(rng.normal(size=(4, n, 3)) * 30.0)
    mask = jnp.ones((4, n), bool)
    mesh = get_mesh(("atom",))
    body = jax.shard_map(
        lambda pb, mb: t.log_prob_sharded(pb, mb, "atom"),
        mesh=mesh, in_specs=(P(None, "atom"), P(None, "atom")),
        out_specs=P(None))
    lp_s = body(pos, mask)
    lp_d = jax.vmap(t.log_prob)(pos)
    np.testing.assert_allclose(np.asarray(lp_s), np.asarray(lp_d),
                               rtol=1e-6)


def test_lj_fluid_matches_bruteforce_min_image():
    """lj_fluid dense oracle: energy == explicit pair loop with min-image
    wrapping, cutoff honored, and a translated-by-box configuration gives
    the identical density (periodic topology)."""
    rng = np.random.default_rng(3)
    n, box, cut, soft = 6, 2.5, 1.1, 0.05
    t = targets.lj_fluid(n, box=box, kBT=2.0, softening=soft, cutoff=cut)
    x = jnp.asarray(rng.uniform(0, box, size=(n, 3)))

    u = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            d = np.array(x[i] - x[j])
            d -= np.round(d / box) * box
            d2 = float((d * d).sum())
            if d2 >= cut * cut:
                continue
            r_sq = d2 + soft
            u += 4.0 * (r_sq ** -6 - r_sq ** -3)
    np.testing.assert_allclose(float(t.log_prob(x)), -u / 2.0, rtol=1e-12)

    # periodic invariance: shift one atom by a full box length
    x2 = x.at[0].add(jnp.array([box, -box, 2 * box]))
    np.testing.assert_allclose(float(t.log_prob(x2)), float(t.log_prob(x)),
                               rtol=1e-12)


def test_lj_fluid_e_cap_and_traced_overrides():
    """The pair-only e_cap bounds the overlap wall and the traced
    softening/e_cap overrides run under jit without retracing NaNs."""
    n, box = 4, 3.0
    t = targets.lj_fluid(n, box=box, kBT=1.0, e_cap=100.0)
    x = jnp.zeros((n, 3)).at[1].set(jnp.array([1e-4, 0, 0])) \
        .at[2].set(jnp.array([0, 1.2, 0])).at[3].set(jnp.array([1.5, 1.5, 0]))
    lp = float(t.log_prob(x))
    assert np.isfinite(lp)            # wall capped
    # overrides are traced scalars: one jitted program serves the anneal
    f = jax.jit(lambda s, c: t.log_prob(x, softening=s, e_cap=c))
    a = float(f(jnp.asarray(0.1), jnp.asarray(50.0)))
    b = float(f(jnp.asarray(0.0), jnp.asarray(100.0)))
    assert np.isfinite(a) and np.isfinite(b) and a != b
    g = jax.grad(lambda xx: t.log_prob(xx))(x)
    assert np.isfinite(np.asarray(g)).all()
