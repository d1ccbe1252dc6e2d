"""Relay transport probe — the methodology behind the cold-start
claims in BENCHMARKS.md (stage-timestamped first-fetch + fetch-size
sweep; run from a FRESH process after varying idle gaps to map the
relay warm-state decay)."""
import time, sys, os
t_start = time.time()
def log(msg):
    print(f"[{time.time()-t_start:8.1f}s] {msg}", flush=True)
log("python up")
import jax
log("import jax done")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
t0=time.time()
d = jax.devices()
log(f"jax.devices() -> {d} ({time.time()-t0:.1f}s)")
import jax.numpy as jnp
import numpy as np
t0=time.time()
x = jnp.ones((256,256))
log(f"first transfer (256x256 put) {time.time()-t0:.1f}s")
t0=time.time()
y = (x@x).block_until_ready()
log(f"first matmul compile+run {time.time()-t0:.1f}s")
t0=time.time()
z = np.asarray(y)
log(f"small fetch (256KB) {time.time()-t0:.1f}s val={float(z[0,0])}")
# fetch-size sweep (VERDICT #3: characterize the relay)
for mb in (1, 4, 16, 64):
    n = int((mb*1024*1024/4)**0.5)
    t0=time.time()
    w = (jnp.ones((n,n)) * 2.0).block_until_ready()
    t1=time.time()
    _ = np.asarray(w)
    log(f"fetch {mb}MB: compute {t1-t0:.1f}s fetch {time.time()-t1:.1f}s")
log("probe done")
