"""Worker process for the multi-process (multi-host) training test.

Launched by tests/test_multiprocess.py as a SUBPROCESS (not collected by
pytest):

    python tests/mp_worker.py <process_id> <num_processes> <port> \
        <root> [--resume-epochs N]

Each worker forces the CPU platform with 4 virtual devices, joins the
JAX distributed runtime over a localhost coordinator with gloo CPU
collectives, and runs the REAL training CLI (`agacs_tpu.bin.train.main`)
— the same code path a real multi-host TPU pod would take:
sampler (global batch list) -> local_batch_rows row slicing ->
`make_array_from_process_local_data` batch assembly -> GSPMD train step
-> orbax collective checkpointing -> resume -> n-best averaging.

The reference's analogue is `test_distributed_launch.py:20-80` (spawn
launcher with nprocs=2 on localhost), but this worker goes further: it
executes a full 2-epoch training and the host writes per-process history
JSON that the pytest side compares for exact 1-vs-2-process parity.
"""

import json
import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = int(sys.argv[3])
    root = sys.argv[4]
    resume_epochs = 0
    if "--resume-epochs" in sys.argv:
        resume_epochs = int(sys.argv[sys.argv.index("--resume-epochs") + 1])

    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=4")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc
    assert len(jax.local_devices()) == 4

    # sanity: cross-process batch assembly places rows where the trainer
    # expects them (process i's block = rows [i*B/n : (i+1)*B/n])
    import numpy as np
    from jax.experimental import multihost_utils

    from agacs_tpu.parallel.mesh import local_batch_rows, make_mesh, shard_batch

    mesh = make_mesh()
    global_b = 8
    full = np.arange(global_b * 3, dtype=np.float32).reshape(global_b, 3)
    rows = local_batch_rows(mesh, global_b)
    garr = shard_batch(mesh, {"x": full[rows]}, process_local=True)["x"]
    gathered = multihost_utils.process_allgather(garr, tiled=True)
    np.testing.assert_array_equal(np.asarray(gathered), full)

    exp_dir = os.path.join(root, "exp_mp")
    args = [
        "--config", os.path.join(root, "train.yaml"),
        "--train_dir", os.path.join(root, "data/train"),
        "--valid_dir", os.path.join(root, "data/valid"),
        "--exp_dir", exp_dir,
        "--compute_dtype", "float32",
        "--ckpt_backend", "orbax",
        "--num_att_plot", "0",
    ]

    from agacs_tpu.bin import train

    if resume_epochs:
        # phase 2: restore the collective orbax checkpoint and continue
        out = train.main(args + ["--resume",
                                 "--max_epoch", str(resume_epochs)])
    else:
        out = train.main(args)

    hist_path = os.path.join(root, f"history_p{pid}.json")
    with open(hist_path, "w") as f:
        json.dump({str(k): v for k, v in out["history"].items()}, f)
    print(f"[worker {pid}] DONE", flush=True)


if __name__ == "__main__":
    main()
