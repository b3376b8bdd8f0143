"""Pipeline configuration mirroring the reference CLI surface.

Maps every behavior-bearing flag of the reference (Config struct,
/root/reference/main.go:34-47; defaults proven by config_test.go:12-166)
onto engine parameters, so a user of the reference can express the same
run against this engine:

| reference flag            | here                          |
|---------------------------|-------------------------------|
| --json-prefix             | json_prefix                   |
| --timestamp-fields        | timestamp_fields              |
| --level-fields            | level_fields                  |
| --message-fields          | message_fields                |
| --continuation-pattern    | continuation_pattern          |
| --batch-size              | arrow batch size / trigger    |
| --flush-interval          | streaming trigger interval    |
| --timeout                 | (write-task timeout; n/a)     |
| --passthrough-stdout/err  | passthrough_raw_sink          |
| positional command        | (n/a: input table plays the   |
|                           |  wrapped process's streams)   |
"""

from __future__ import annotations

from dataclasses import dataclass, field

from otel_logger_spark.functions.parse import (
    DEFAULT_LEVEL_FIELDS,
    DEFAULT_MESSAGE_FIELDS,
    DEFAULT_TIMESTAMP_FIELDS,
)
from otel_logger_spark.operators.multiline import DEFAULT_CONTINUATION_PATTERN


@dataclass
class PipelineConfig:
    json_prefix: str | None = None  # None -> default prefix regex (main.go:148)
    timestamp_fields: tuple[str, ...] = DEFAULT_TIMESTAMP_FIELDS
    level_fields: tuple[str, ...] = DEFAULT_LEVEL_FIELDS
    message_fields: tuple[str, ...] = DEFAULT_MESSAGE_FIELDS
    continuation_pattern: str = DEFAULT_CONTINUATION_PATTERN
    coalesce_multiline: bool = True
    batch_size: int = 10_000  # arrow batch (reference default 50 is an
    # export batch; Arrow batches are the engine's unit of bounded memory)
    flush_interval: str = "5 seconds"  # streaming trigger (main.go:38)
    passthrough_raw_sink: bool = False  # tee of raw entries (main.go:42-43)
    repartition: int | None = None  # explicit conv_id hash partitions
    salt_buckets: int = 16

    @classmethod
    def from_reference_args(cls, argv: list[str]) -> "PipelineConfig":
        """Parse a reference-style flag list (subset of main.go:34-47)."""
        cfg = cls()
        i = 0
        fields_map = {
            "--timestamp-fields": "timestamp_fields",
            "--level-fields": "level_fields",
            "--message-fields": "message_fields",
        }
        lists: dict[str, list[str]] = {v: [] for v in fields_map.values()}
        while i < len(argv):
            a = argv[i]
            if a == "--json-prefix":
                cfg.json_prefix = argv[i + 1]
                i += 2
            elif a in fields_map:
                # reference: --x-fields is repeatable, comma-splittable
                lists[fields_map[a]].extend(
                    s.strip() for s in argv[i + 1].split(",") if s.strip()
                )
                i += 2
            elif a == "--continuation-pattern":
                cfg.continuation_pattern = argv[i + 1]
                i += 2
            elif a == "--batch-size":
                cfg.batch_size = int(argv[i + 1])
                i += 2
            elif a == "--flush-interval":
                cfg.flush_interval = argv[i + 1].replace("s", " seconds")
                i += 2
            elif a == "--passthrough-stdout" or a == "--passthrough-stderr":
                cfg.passthrough_raw_sink = True
                i += 1
            else:
                i += 1
        for attr, vals in lists.items():
            if vals:  # CLI overrides defaults wholesale (main.go:621-630)
                setattr(cfg, attr, tuple(vals))
        return cfg
