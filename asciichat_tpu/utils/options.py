"""Options system: domain registry + TOML config + lock-free snapshots +
generated help/completions.

Maps the reference's 22k-LoC options stack (lib/options/, SURVEY §2c):
- single-source registry of descriptors grouped by domain with per-mode
  bitmasks (lib/options/registry/*.c)
- builder API generating the argparse surface (lib/options/builder/)
- TOML config files + named presets (lib/options/config/config.c)
- RCU-published immutable snapshots read lock-free from hot threads
  (lib/options/rcu.c, GET_OPTION()): here an atomically-swapped frozen
  namespace — Python reference assignment is atomic, readers never lock
- generated shell completions + manpage text (lib/options/ generators)
"""

from __future__ import annotations

import dataclasses
import enum
import tomllib
from typing import Any, Callable


class Mode(enum.IntFlag):
    """Per-mode applicability bitmask (lib/options/registry mode masks)."""

    MIRROR = 1
    SERVER = 2
    CLIENT = 4
    DISCOVERY = 8
    ACDS = 16
    ALL = 31


@dataclasses.dataclass(frozen=True)
class OptionDescriptor:
    name: str
    domain: str
    type: type
    default: Any
    help: str
    modes: Mode = Mode.ALL
    choices: tuple | None = None
    validator: Callable[[Any], bool] | None = None
    short: str | None = None

    def validate(self, value: Any) -> Any:
        if self.type is bool and isinstance(value, str):
            value = value.lower() in ("1", "true", "yes", "on")
        value = self.type(value)
        if self.choices and value not in self.choices:
            raise ValueError(f"--{self.name}: {value!r} not in {self.choices}")
        if self.validator and not self.validator(value):
            raise ValueError(f"--{self.name}: invalid value {value!r}")
        return value


class OptionsRegistry:
    def __init__(self):
        self._descriptors: dict[str, OptionDescriptor] = {}

    def register(self, desc: OptionDescriptor) -> None:
        if desc.name in self._descriptors:
            raise ValueError(f"duplicate option {desc.name!r}")
        self._descriptors[desc.name] = desc

    def add(self, name: str, domain: str, type_: type, default: Any, help_: str,
            **kw) -> None:
        self.register(OptionDescriptor(name, domain, type_, default, help_, **kw))

    def descriptors(self, mode: Mode | None = None, domain: str | None = None):
        for d in self._descriptors.values():
            if mode is not None and not (d.modes & mode):
                continue
            if domain is not None and d.domain != domain:
                continue
            yield d

    def defaults(self) -> dict[str, Any]:
        return {d.name: d.default for d in self._descriptors.values()}

    def __contains__(self, name: str) -> bool:
        return name in self._descriptors

    def __getitem__(self, name: str) -> OptionDescriptor:
        return self._descriptors[name]


class FrozenOptions:
    """Immutable snapshot; attribute reads are the GET_OPTION() analog."""

    __slots__ = ("_values",)

    def __init__(self, values: dict[str, Any]):
        object.__setattr__(self, "_values", dict(values))

    def __getattr__(self, name: str) -> Any:
        try:
            return self._values[name.replace("_", "-")]
        except KeyError:
            raise AttributeError(name) from None

    def __getitem__(self, name: str) -> Any:
        return self._values[name]

    def __setattr__(self, name, value):
        raise AttributeError("options snapshots are immutable; use publish()")

    def as_dict(self) -> dict[str, Any]:
        return dict(self._values)


class OptionsStore:
    """Atomically-swapped current snapshot (RCU publish analog)."""

    def __init__(self, registry: OptionsRegistry):
        self.registry = registry
        self._current = FrozenOptions(registry.defaults())

    @property
    def current(self) -> FrozenOptions:
        return self._current  # single reference read: lock-free for readers

    def publish(self, **overrides: Any) -> FrozenOptions:
        values = self._current.as_dict()
        for k, v in overrides.items():
            key = k.replace("_", "-")
            if key not in self.registry:
                raise KeyError(f"unknown option {key!r}")
            values[key] = self.registry[key].validate(v)
        snap = FrozenOptions(values)
        self._current = snap
        return snap

    def load_toml(self, path: str, preset: str | None = None) -> FrozenOptions:
        """[domain] tables + optional [preset.<name>] overlays
        (lib/options/config/config.c semantics)."""
        with open(path, "rb") as f:
            data = tomllib.load(f)
        overrides: dict[str, Any] = {}

        def absorb(table: dict) -> None:
            for dom, section in table.items():
                if dom == "preset":
                    continue
                if not isinstance(section, dict):
                    # top-level bare key
                    if dom in self.registry:
                        overrides[dom] = section
                    continue
                for key, value in section.items():
                    name = key if key in self.registry else f"{dom}-{key}"
                    if name in self.registry:
                        overrides[name] = value
                    elif key in self.registry:
                        overrides[key] = value
                    else:
                        raise KeyError(f"unknown option {dom}.{key} in {path}")

        absorb(data)
        if preset:
            presets = data.get("preset", {})
            if preset not in presets:
                raise KeyError(f"no preset {preset!r} in {path}")
            absorb(presets[preset])
        return self.publish(**{k.replace("-", "_"): v for k, v in overrides.items()})


# ---------------------------------------------------------------------------
# Generators (help / completions), from the registry single source of truth.


def generate_help(registry: OptionsRegistry, mode: Mode) -> str:
    out = []
    domains: dict[str, list[OptionDescriptor]] = {}
    for d in registry.descriptors(mode=mode):
        domains.setdefault(d.domain, []).append(d)
    for dom in sorted(domains):
        out.append(f"{dom} options:")
        for d in sorted(domains[dom], key=lambda x: x.name):
            choices = f" ({'/'.join(map(str, d.choices))})" if d.choices else ""
            out.append(f"  --{d.name:<24}{d.help}{choices} [default: {d.default}]")
        out.append("")
    return "\n".join(out)


def generate_completions(registry: OptionsRegistry, shell: str, prog: str = "asciichat-tpu") -> str:
    names = sorted(f"--{d.name}" for d in registry.descriptors())
    if shell == "bash":
        return (
            f"_{prog.replace('-', '_')}() {{\n"
            f"  COMPREPLY=( $(compgen -W \"{' '.join(names)}\" -- \"${{COMP_WORDS[COMP_CWORD]}}\") )\n"
            f"}}\ncomplete -F _{prog.replace('-', '_')} {prog}\n"
        )
    if shell == "zsh":
        args = "\n  ".join(f"'{n}[{registry[n[2:]].help}]'" for n in names)
        return f"#compdef {prog}\n_arguments \\\n  {args}\n"
    if shell == "fish":
        return "\n".join(
            f"complete -c {prog} -l {d.name} -d '{d.help}'"
            for d in sorted(registry.descriptors(), key=lambda x: x.name)
        )
    raise ValueError(f"unknown shell {shell!r}")


# ---------------------------------------------------------------------------
# The framework's registry (domains mirror lib/options/registry/*.c).


def default_registry() -> OptionsRegistry:
    r = OptionsRegistry()
    add = r.add
    # display
    add("width", "display", int, 0, "output width in characters (0=auto)")
    add("height", "display", int, 0, "output height in characters (0=auto)")
    add("palette", "display", str, "standard", "glyph palette name or custom chars")
    add("render-mode", "display", int, 0, "0=foreground 1=background 2=half-block",
        choices=(0, 1, 2))
    add("color-mode", "display", str, "auto", "color depth override",
        choices=("auto", "none", "16", "256", "truecolor"))
    add("color-filter", "display", str, "none", "monochromatic tint filter")
    add("stretch", "display", bool, False, "ignore aspect ratio")
    add("show-fps", "display", bool, False, "FPS overlay")
    add("matrix", "display", bool, False, "digital rain overlay",
        modes=Mode.MIRROR | Mode.CLIENT)
    add("flip-x", "display", bool, False, "mirror horizontally")
    add("flip-y", "display", bool, False, "mirror vertically")
    # media
    add("test-pattern", "media", bool, False, "synthetic webcam source",
        modes=Mode.MIRROR | Mode.CLIENT | Mode.DISCOVERY)
    add("file", "media", str, "", "media file source", modes=Mode.MIRROR | Mode.CLIENT)
    add("loop", "media", bool, False, "loop file playback", modes=Mode.MIRROR | Mode.CLIENT)
    add("fps", "media", float, 30.0, "capture rate cap",
        validator=lambda v: 0 < v <= 144)
    # network
    add("port", "network", int, 27224, "TCP port",
        validator=lambda v: 0 < v < 65536)
    add("host", "network", str, "0.0.0.0", "bind address", modes=Mode.SERVER | Mode.ACDS)
    add("compress", "network", int, 1, "zstd level", validator=lambda v: 1 <= v <= 9)
    add("no-compress", "network", bool, False, "disable compression")
    add("no-reconnect", "network", bool, False, "disable auto-reconnect",
        modes=Mode.CLIENT | Mode.DISCOVERY)
    # security
    add("encrypt", "security", bool, False, "encrypted session",
        modes=Mode.CLIENT | Mode.DISCOVERY)
    add("password", "security", str, "", "session password")
    # audio
    add("audio", "audio", bool, False, "enable audio")
    add("audio-gain", "audio", float, 1.0, "base mixer gain",
        validator=lambda v: 0 <= v <= 4)
    # logging
    add("log-level", "log", str, "INFO", "log verbosity",
        choices=("DEV", "DEBUG", "INFO", "WARNING", "ERROR"))
    add("log-file", "log", str, "", "log file path (3MB rotation)")
    add("grep", "log", str, "", "regex filter on log messages")
    add("log-json", "log", bool, False, "JSON log sink")
    return r
