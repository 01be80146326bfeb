import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from nexus_tpu.bsdf import lobes
from nexus_tpu.bsdf.dispatch import sample_bsdf, eval_bsdf
from nexus_tpu.scene.materials import Materials, LAMBERTIAN, PLASTIC, DIELECTRIC, CONDUCTOR

N = 100_000
key = jax.random.PRNGKey(7)
ku, kw = jax.random.split(key)
u = jax.random.uniform(ku, (N, 5))
wi = jnp.tile(jnp.asarray([[0.3, 0.2, 0.933]]), (N, 1))
wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)

def mk(mtype, rough=0.5):
    return Materials(
        mtype=jnp.full((N,), mtype, jnp.int32),
        albedo=jnp.full((N, 3), 0.7),
        emission=jnp.zeros((N, 3)), intensity=jnp.zeros((N,)),
        roughness=jnp.full((N,), rough), ior=jnp.full((N,), 1.45),
        opacity=jnp.ones((N,)),
        eta=jnp.full((N, 3), 0.2), k=jnp.full((N, 3), 3.0),
        diffuse_map=jnp.full((N,), -1, jnp.int32),
        emissive_map=jnp.full((N,), -1, jnp.int32))

for name, mt, rough in [("lambertian", LAMBERTIAN, 0.5),
                        ("plastic", PLASTIC, 0.4),
                        ("dielectric", DIELECTRIC, 0.3),
                        ("conductor", CONDUCTOR, 0.4)]:
    mat = mk(mt, rough)
    wo, thr, pdf, ok = jax.jit(sample_bsdf)(mat, wi, u, False)
    okn = np.asarray(ok)
    thrn = np.asarray(thr)[okn]
    mean_thr = thrn.mean(axis=0) * okn.mean()
    assert np.isfinite(np.asarray(thr)).all(), f"{name}: nonfinite thr"
    assert np.isfinite(np.asarray(pdf)).all(), f"{name}: nonfinite pdf"
    # passivity: E[throughput] <= 1 (+3sigma MC headroom)
    assert (mean_thr <= 1.0 + 0.01).all(), f"{name}: energy gain {mean_thr}"
    if name == "lambertian":
        assert np.allclose(mean_thr, 0.7, atol=0.01), f"furnace {mean_thr}"
    # pdf consistency: eval at sampled wo vs reported sample pdf
    if name in ("lambertian", "plastic", "conductor"):
        ethr, epdf, eok = jax.jit(eval_bsdf)(mat, wi, wo, False)
        sel = okn & np.asarray(eok) & (np.asarray(wo)[:, 2] > 1e-3) & (np.asarray(pdf) > 1e-3)
        rel = np.abs(np.asarray(epdf)[sel] - np.asarray(pdf)[sel]) / np.asarray(pdf)[sel]
        p99 = np.percentile(rel, 99)
        assert p99 < 1e-2, f"{name}: pdf p99 {p99}"
    print(f"{name}: furnace E[thr]={mean_thr.round(4)} ok")

# grazing incidence probe
wi_g = jnp.tile(jnp.asarray([[0.9999, 0.0, 0.0141]]), (N, 1))
wi_g = wi_g / jnp.linalg.norm(wi_g, axis=-1, keepdims=True)
for name, mt in [("plastic", PLASTIC), ("dielectric", DIELECTRIC), ("conductor", CONDUCTOR)]:
    wo, thr, pdf, ok = jax.jit(sample_bsdf)(mk(mt), wi_g, u, False)
    assert np.isfinite(np.asarray(thr)).all() and np.isfinite(np.asarray(pdf)).all(), name
print("grazing: all finite")

# gradient probes: roughness + albedo through sample_bsdf; TIR boundary
def g_ro(r):
    mat = mk(PLASTIC, 0.5)
    mat = mat.replace(roughness=mat.roughness * r)
    wo, thr, pdf, ok = sample_bsdf(mat, wi, u, False)
    return jnp.sum(jnp.where(ok, pdf, 0.0)) + jnp.sum(jnp.where(ok[:, None], thr, 0.0))
g = jax.jit(jax.grad(g_ro))(1.0)
assert np.isfinite(float(g)), "roughness grad"
def g_tir(i):
    mat = mk(DIELECTRIC, 0.2).replace(ior=jnp.full((N,), 1.0) * i)
    wo, thr, pdf, ok = sample_bsdf(mat, wi, u, False)
    return jnp.sum(jnp.where(ok[:, None], thr, 0.0))
g2 = jax.jit(jax.grad(g_tir))(1.333)
assert np.isfinite(float(g2)), "TIR grad"
# power_heuristic edge cases after the sanitize change
from nexus_tpu.core.sampling import power_heuristic, balance_heuristic
for a, b in [(1e10, 1e-20), (1e-20, 1e10), (np.inf, 1.0), (1.0, np.inf),
             (np.nan, 1.0), (0.0, 0.0), (1e10, np.inf)]:
    w = float(power_heuristic(jnp.float32(a), jnp.float32(b)))
    wb = float(balance_heuristic(jnp.float32(a), jnp.float32(b)))
    assert np.isfinite(w) and 0 <= w <= 1, (a, b, w)
    assert np.isfinite(wb) and 0 <= wb <= 1, (a, b, wb)
    ga = float(jax.grad(lambda x: power_heuristic(x, jnp.float32(b)))(jnp.float32(a)))
    assert np.isfinite(ga), (a, b, ga)
print("grads + heuristic edges: finite")
print("DRIVE OK")
