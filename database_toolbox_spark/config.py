"""Connection-config resolution (SURVEY.md §2.A A9).

The reference resolves every engine binding from environment variables with
alias remapping (`REDSHIFT_*` → `POSTGRES_*`,
`/root/reference/images/redshift/entrypoint.sh:33-65`), validates required
parameters up front (`images/snowflake-mcp/entrypoint.sh:121-130`), and
enforces exactly-one-auth (`:144-153`). Here the "connection" is a Parquet
directory + Spark settings; the same resolution/validation semantics apply
at session build.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

# Alias remapping, mirroring the reference's entrypoint env translation
# (images/redshift/entrypoint.sh:33-65): engine-specific names fold onto the
# canonical ones; canonical wins when both are set.
_ALIASES: dict[str, str] = {
    "DTS_DATA_DIR": "SPARK_GRAFT_SF_DIR",
    "DTS_CPUS": "SPARK_GRAFT_CPUS",
    "DTS_SHUFFLE_PARTITIONS": "SPARK_GRAFT_SHUFFLE",
}


class ConfigError(ValueError):
    """Raised for missing/conflicting configuration, mirroring the
    reference's fail-fast entrypoint validation
    (tests/snowflake/test_mcp.py:525-586 asserts specific messages)."""


@dataclass(frozen=True)
class EngineConfig:
    sf_dir: str
    cpus: str = "32"
    shuffle_partitions: str | None = None
    extra_spark_conf: dict[str, str] = field(default_factory=dict)

    def validate(self) -> "EngineConfig":
        if not self.sf_dir:
            raise ConfigError("Missing required parameter: sf_dir (data directory)")
        if not os.path.isdir(self.sf_dir):
            raise ConfigError(f"sf_dir is not a directory: {self.sf_dir!r}")
        if not str(self.cpus).isdigit() and self.cpus != "*":
            raise ConfigError(f"cpus must be an integer or '*': {self.cpus!r}")
        return self


def resolve_env(env: dict[str, str] | None = None) -> EngineConfig:
    """Environment → validated config, with alias remapping."""
    env = dict(os.environ if env is None else env)
    for alias, canonical in _ALIASES.items():
        if alias in env and canonical not in env:
            env[canonical] = env[alias]
    return EngineConfig(
        sf_dir=env.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        cpus=env.get("SPARK_GRAFT_CPUS", "32"),
        shuffle_partitions=env.get("SPARK_GRAFT_SHUFFLE"),
    ).validate()
