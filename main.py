#!/usr/bin/env python
"""Train / evaluate / push CLI.

Parity with the reference entry point (/root/reference/main.py:18-59):

  python main.py --config_path=protoasnet_tpu/configs/ours_protoasnet_video.yml \\
      --run_name=my_run --save_dir=logs [--eval_only=true --eval_data_type=test] \\
      [--push_only=true] [--model.checkpoint_path=...] [--any.nested.key=value]
"""

import logging

from protoasnet_tpu.utils.config import updated_config, dump_config
from protoasnet_tpu.utils.run import (backup_code, create_save_loc,
                                      enable_compilation_cache, set_logger,
                                      set_seed)


def main():
    # Multi-host bring-up must precede ANY other JAX API use (the
    # coordinator handshake has to run before the XLA backend comes up),
    # so it happens here at process entry, decided from env vars alone.
    from protoasnet_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed()
    enable_compilation_cache()

    config = updated_config()
    create_save_loc(config)
    save_dir = config["save_dir"]

    run_type = "train"
    if config.get("eval_only"):
        run_type = f"eval_{config.get('eval_data_type', 'val')}"
    elif config.get("push_only"):
        run_type = "push"
    set_logger(save_dir, config.get("log_level", "info"), run_type)
    dump_config(config, f"{save_dir}/config_{run_type}.yml")
    set_seed(int(config["train"].get("seed", 0)))
    if run_type == "train":
        backup_code(save_dir)

    from protoasnet_tpu.train.agents import build_agent

    agent = build_agent(config)

    if config.get("eval_only"):
        agent.evaluate(mode=config.get("eval_data_type", "val"))
    elif config.get("push_only"):
        agent.push(replace_prototypes=False)
    else:
        agent.run()
        logging.info("evaluating the final model on val")
        agent.evaluate(mode="val")
    agent.finalize()


if __name__ == "__main__":
    main()
