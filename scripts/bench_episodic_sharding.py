"""Measure the episodic-sharding decision (SCALING.md).

``train/runner.py::run`` deliberately keeps episodic training single-device
under a mesh; this script backs that decision with numbers: one epoch of
reference-geometry episodes at ImageNet scale (N=1000, K=16, d=1024), run

1. replicated (the shipped path) on the default backend, and
2. with the episode query buffers sharded over the ``data`` mesh axis
   (params replicated) — jit propagates the input shardings, so this is
   exactly what "shard the episodic step" would ship as.

Usage (virtual mesh):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/bench_episodic_sharding.py [--devices 8] [--repeats 5]

Prints one JSON line with per-epoch wall times; paste into SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--devices", type=int, default=0, help="mesh size (0 = all)")
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument("--n-class", type=int, default=1000)
    parser.add_argument("--k-shots", type=int, default=16)
    parser.add_argument("--dim", type=int, default=1024)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from protoclip_tpu.parallel import make_mesh
    from protoclip_tpu.train.episodic import EpisodicTrainer, make_episode_queries

    n, k, d = args.n_class, args.k_shots, args.dim
    rng = np.random.default_rng(0)
    keys = rng.standard_normal((n * k, d)).astype(np.float32)
    keys /= np.linalg.norm(keys, axis=-1, keepdims=True)
    bank_t = rng.standard_normal((n, d)).astype(np.float32)

    trainer = EpisodicTrainer(
        frozen_keys=keys, bank_t_init=bank_t, n_class=n, k_shots=k,
        adapter_kind="fc", alpha=0.5, beta=12.0, train_epoch=2000, seed=0,
    )
    q_idx, q_lab, q_w, valid = make_episode_queries(np.random.default_rng(1), n, k)
    lr = jnp.asarray(1e-4, jnp.float32)

    def time_epoch(place):
        """Median wall time of one epoch dispatch (+ sync) after warm-up."""
        inputs = (
            place(jnp.asarray(q_idx)), place(jnp.asarray(q_lab)),
            place(jnp.asarray(q_w)), place(jnp.asarray(valid)),
        )
        params, opt_state = trainer.params, trainer.opt_state

        def once():
            t0 = time.monotonic()
            p2, o2, agg = trainer._epoch_fn(
                params, opt_state, trainer._frozen_keys, trainer._frozen_bank_t,
                *inputs, lr,
            )
            float(agg["loss"])  # sync (works through remote backends too)
            return time.monotonic() - t0

        once()  # compile + warm
        return float(np.median([once() for _ in range(args.repeats)]))

    t_single = time_epoch(lambda x: x)

    mesh = make_mesh(args.devices or None)
    n_dev = int(mesh.devices.size)
    rep = NamedSharding(mesh, P())
    row_sharded = NamedSharding(mesh, P(None, "data"))  # (E, Q): shard Q

    # re-place the trainer state replicated on the mesh so jit's sharding
    # propagation starts from explicit layouts
    trainer.params = jax.device_put(trainer.params, rep)
    trainer.opt_state = jax.device_put(trainer.opt_state, rep)
    trainer._frozen_keys = jax.device_put(trainer._frozen_keys, rep)
    trainer._frozen_bank_t = jax.device_put(trainer._frozen_bank_t, rep)

    def place_sharded(x):
        return jax.device_put(x, row_sharded if x.ndim == 2 else rep)

    with mesh:
        t_sharded = time_epoch(place_sharded)

    E, Q = q_idx.shape
    out = {
        "backend": jax.default_backend(),
        "devices": n_dev,
        "n_class": n,
        "k_shots": k,
        "dim": d,
        "episodes_per_epoch": int(E),
        "query_buffer": int(Q),
        "epoch_s_replicated": round(t_single, 4),
        "epoch_s_query_sharded": round(t_sharded, 4),
        "sharded_over_replicated": round(t_sharded / t_single, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
