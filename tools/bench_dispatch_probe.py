"""Probe: is the throughput bench device-bound or dispatch-bound?

Prints enqueue-only time vs total (enqueue+drain) time for the flagship
predict. If enqueue ≈ total, the tunnel's per-call dispatch serializes the
pipeline and the device is partially idle (a LOCAL chip would not have
this ceiling).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
    import numpy as np
    from __graft_entry__ import entry
    fn, (variables, batch) = entry()
    jfn = jax.jit(fn)
    n = 12
    host_pts = np.asarray(batch['points'])
    batches = [batch]
    for i in range(1, n):
        b = dict(batch)
        b['points'] = jax.device_put(host_pts + np.float32(0.001 * i))
        batches.append(b)
    for b in batches:
        jax.block_until_ready(jfn(variables, b))

    t0 = time.perf_counter()
    outs = [jfn(variables, batches[i]) for i in range(n)]
    t_enq = time.perf_counter() - t0
    for o in outs:
        jax.block_until_ready(o)
    t_tot = time.perf_counter() - t0
    print(f'enqueue {t_enq*1e3:.1f} ms  total {t_tot*1e3:.1f} ms '
          f'({t_tot/n*1e3:.1f} ms/frame)  drain {(t_tot-t_enq)*1e3:.1f} ms')


if __name__ == '__main__':
    main()
