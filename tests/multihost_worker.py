"""Multi-host test worker: one REAL jax.distributed process.

Launched by tests/test_parallel.py::test_multihost_two_process_training
as ``python multihost_worker.py <pid> <P> <port>``.  Each process gets 4
virtual CPU devices; the dp mesh spans all P×4 global devices (Gloo
collectives).  Runs the production Trainer for 4 steps on
seed-deterministic batches (identical in every process — the multi-host
contract ``prepare_process_batch`` documents) and prints one JSON line
with the per-step losses.
"""

import json
import os
import sys


def main() -> None:
    pid, P, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=P, process_id=pid)
    assert jax.process_count() == P
    assert jax.device_count() == 4 * P

    import numpy as np
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from vae_captioning_tpu.config import Config
    from vae_captioning_tpu.data.batcher import Batch
    from vae_captioning_tpu.train import Trainer

    cfg = Config(embed_size=16, latent_size=8, encoder_hidden=16,
                 decoder_hidden=16, gen_z_samples=4, batch_size=16,
                 prior="Normal", learning_rate=0.05, optimizer="SGD")
    cfg.vocab_size = 40
    trainer = Trainer(cfg)

    losses = []
    for step in range(4):
        rng = np.random.default_rng(step)  # same batch in EVERY process
        B, K, T = 16, 2, 8
        dec = rng.integers(1, 40, size=(B, K, T)).astype(np.int32)
        lab = np.concatenate([dec[:, :, 1:], np.zeros((B, K, 1), np.int32)],
                             -1)
        lengths = np.full((B, K), T - 1, np.int32)
        c_v = rng.random((B, 90)).astype(np.float32)
        c_v /= c_v.sum(-1, keepdims=True)
        batch = Batch(features=rng.normal(size=(B, 4096)).astype(np.float32),
                      dec_inputs=dec, labels=lab, lengths=lengths,
                      cluster_vectors=c_v, valid=B)
        m = trainer.run_step(batch)
        losses.append(float(m["loss"]))
    print(json.dumps({"pid": pid, "losses": losses}), flush=True)


if __name__ == "__main__":
    main()
