"""Config template consistency (reference
tests/test_config_template_consistency.py): .env.example <-> config.py <->
admin config-center descriptors must agree."""

import os

from deepvision_tpu.web import config as config_defaults
from deepvision_tpu.web.env import parse_env_file
from deepvision_tpu.web.routes.routes_admin import CONFIG_GROUPS

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env_example_keys():
    return set(parse_env_file(os.path.join(ROOT, ".env.example")).keys())


def _config_keys():
    return {
        k for k in vars(config_defaults)
        if k.isupper() and not k.startswith("_")
    }


def test_env_example_keys_exist_in_config_defaults():
    env_keys = _env_example_keys()
    cfg_keys = _config_keys()
    special = {"DEEPVISION_ENV_FILE"}  # resolution meta-keys
    missing = env_keys - cfg_keys - special
    assert not missing, f".env.example keys without defaults: {missing}"


def test_config_defaults_documented_in_env_example():
    env_keys = _env_example_keys()
    cfg_keys = _config_keys()
    undocumented = cfg_keys - env_keys
    assert not undocumented, (
        f"config.py keys missing from .env.example: {undocumented}"
    )


def test_admin_config_center_keys_are_real():
    cfg_keys = _config_keys()
    for group, keys in CONFIG_GROUPS.items():
        for key in keys:
            assert key in cfg_keys, (
                f"config-center group {group!r} exposes unknown key {key!r}"
            )
