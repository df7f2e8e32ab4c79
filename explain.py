#!/usr/bin/env python
"""Explanation CLI.

Parity with the reference (/root/reference/explain.py:17-52):

  python explain.py --config_path=... --explain_locally=true \\
      --eval_data_type=test --model.checkpoint_path=<ckpt>
"""

from protoasnet_tpu.utils.config import updated_config, dump_config
from protoasnet_tpu.utils.run import (create_save_loc,
                                      enable_compilation_cache, set_logger,
                                      set_seed)


def main():
    # Multi-host bring-up before any other JAX API use (see main.py).
    from protoasnet_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed()
    enable_compilation_cache()

    config = updated_config()
    create_save_loc(config)
    save_dir = config["save_dir"]
    mode = config.get("eval_data_type", "test")
    run_type = f"explain_{mode}"
    set_logger(save_dir, config.get("log_level", "info"), run_type)
    dump_config(config, f"{save_dir}/config_{run_type}.yml")
    set_seed(int(config["train"].get("seed", 0)))

    from protoasnet_tpu.train.agents import build_agent

    agent = build_agent(config)
    if config.get("explain_locally", True):
        agent.explain_local(mode=mode)
    if config.get("explain_globally", False):
        agent.explain_global(mode=mode)
    agent.finalize()


if __name__ == "__main__":
    main()
