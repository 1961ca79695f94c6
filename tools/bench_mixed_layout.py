"""Judge criterion (VERDICT item 1): per-eval time on a mixed MAF (one
>=10 Mcol block + many ~1 kcol blocks) within ~1.5x of the same columns in
uniform windows."""
import sys, time, warnings
warnings.filterwarnings("ignore")
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from itrails_tpu.core.model import build_model
from itrails_tpu.data.tokens import aggregation_matrix
from itrails_tpu.hmm import decoders
from itrails_tpu.optim.optimizer import LoglikEngine

model = build_model(t_A=0.0024, t_B=0.0024, t_C=0.0028, t_2=0.0004,
    t_upper=0.00745069, t_out=0.009312, N_AB=0.0005, N_ABC=0.0005, r=1.0,
    n_int_AB=3, n_int_ABC=3, dtype="float64", device="cpu")
cast = jnp.float32
a = jnp.asarray(model.a, cast); pi = jnp.asarray(model.pi, cast)
bfull = decoders.emission_table(jnp.asarray(model.b, cast), jnp.asarray(aggregation_matrix(), cast))

rng = np.random.default_rng(0)
# mixed: one 10 Mcol block + 10000 x 1 kcol blocks (20 Mcol total)
v_mixed = [rng.integers(0, 625, size=10_000_000).astype(np.int32)]
v_mixed += [rng.integers(0, 625, size=1000).astype(np.int32) for _ in range(10_000)]
eng = LoglikEngine(v_mixed, 3, 3, dtype="float32")
print("buckets:", [tuple(b.shape) for b in eng.buckets], "long:", [int(t.shape[0]) for t in eng.long_blocks])

def timed(f, n=3):
    f()
    ts = []
    for _ in range(n):
        t0 = time.time(); f(); ts.append(time.time() - t0)
    return float(np.median(ts))

t_mixed = timed(lambda: float(eng._decode(a, bfull, pi)))
cols = eng.n_columns
# uniform: same total columns as uniform windows
w = 2048
v_uni = [rng.integers(0, 625, size=cols // w).astype(np.int32) for _ in range(w)]
eng_u = LoglikEngine(v_uni, 3, 3, dtype="float32")
t_uni = timed(lambda: float(eng_u._decode(a, bfull, pi)))
print(f"mixed decode: {t_mixed*1e3:.0f} ms ({cols/t_mixed/1e6:.0f} Mcol/s)")
print(f"uniform decode: {t_uni*1e3:.0f} ms")
print(f"ratio: {t_mixed/t_uni:.2f}x  (criterion: <=1.5x)")
