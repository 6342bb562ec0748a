"""Minimal configargparse stand-in so the upstream reference implementation
can run in this environment for A/B validation (the real package is not
installed and the image has no network). Supports exactly the API surface
the reference's opt.py uses: ArgumentParser + add_argument with an
`is_config_file` kwarg and `--config <file>` lines of `key = value`."""
import argparse
import shlex


class ArgumentParser(argparse.ArgumentParser):
    def __init__(self, *args, **kwargs):
        kwargs.pop("auto_env_var_prefix", None)
        super().__init__(*args, **kwargs)
        self._config_flags = []

    def add_argument(self, *args, **kwargs):
        if kwargs.pop("is_config_file", False):
            self._config_flags.extend(a for a in args if a.startswith("--"))
            kwargs.setdefault("default", None)
        return super().add_argument(*args, **kwargs)

    def _expand_config(self, argv):
        out = []
        it = iter(argv)
        for a in it:
            if a in self._config_flags:
                path = next(it)
                with open(path) as f:
                    for line in f:
                        line = line.split("#", 1)[0].strip()
                        if not line:
                            continue
                        key, _, val = line.partition("=")
                        out.append("--" + key.strip())
                        out.extend(shlex.split(val.strip()))
            else:
                out.append(a)
        return out

    def parse_args(self, args=None, namespace=None):
        if args is None:
            import sys

            args = sys.argv[1:]
        return super().parse_args(self._expand_config(list(args)), namespace)
