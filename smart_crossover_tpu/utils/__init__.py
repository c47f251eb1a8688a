from smart_crossover_tpu.utils.timer import Timer

__all__ = ["Timer"]

from pathlib import Path


def get_project_root() -> Path:
    """Walk up from cwd to the repository root (parity with the reference's
    path helper, __init__.py:4-13, without the fragile name match: we look
    for pyproject.toml / .git instead)."""
    cur = Path.cwd()
    for p in [cur, *cur.parents]:
        if (p / "pyproject.toml").exists() or (p / ".git").exists():
            return p
    raise FileNotFoundError("project root not found above " + str(cur))


def get_data_dir_path() -> Path:
    return get_project_root() / "data"
