"""Environment package: importing registers the built-in env families."""


def register_all_envs():
    """Import every built-in env module so they self-register."""
    import warpdrive_tpu.envs.classic_control.cartpole  # noqa: F401

    for mod in (
        "warpdrive_tpu.envs.classic_control.mountain_car",
        "warpdrive_tpu.envs.classic_control.continuous_mountain_car",
        "warpdrive_tpu.envs.classic_control.pendulum",
        "warpdrive_tpu.envs.classic_control.acrobot",
        "warpdrive_tpu.envs.tag_gridworld",
        "warpdrive_tpu.envs.tag_continuous",
        "warpdrive_tpu.envs.asymmetric_pursuit",
        "warpdrive_tpu.envs.dummy_env",
        "warpdrive_tpu.envs.chem_search",
    ):
        try:
            __import__(mod)
        except ImportError:
            pass  # env family not built yet (incremental build)
