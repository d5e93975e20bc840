"""Worker for the 2-process multi-process EVAL tests.

Launched by ``tests/test_multihost.py`` as
``python tests/multihost_eval_worker.py <port> <pid> <nproc> <workdir>
<cli> <cli-arg>...``.
Forms a ``jax.distributed`` CPU cluster (2 virtual devices per process)
and runs the REAL eval CLI (``test_matterport.py`` or
``test_streetlearn_interiornet.py``): each process evaluates its strided
shard of the test set on its local devices, predictions are all-gathered,
and process 0 writes results.txt — the pod code path.
"""

import os
import sys


def main():
    port, pid, nproc, workdir = (sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])
    cli, cli_args = sys.argv[5], sys.argv[6:]
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    os.environ.pop("JAX_PLATFORMS", None)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    os.chdir(workdir)
    sys.argv = [cli] + cli_args
    import importlib
    mod = importlib.import_module(cli.removesuffix(".py"))
    mod.main()
    print(f"MULTIHOST_EVAL_OK pid={pid}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
