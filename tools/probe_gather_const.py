#!/usr/bin/env python3
"""Verify the one-hot-constant-folding theory on the real TPU backend:
compile a tile gather with (a) constant indices and (b) argument
indices, and compare serialized executable sizes."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    n, rows = 8161, 17272
    idx_np = np.random.randint(0, n, rows).astype(np.int32)
    tiles = jnp.zeros((n, 16, 16), jnp.int32)

    def g_const(t):
        return t[idx_np].sum()

    def g_arg(t, idx):
        return t[idx].sum()

    for name, fn, args in [
        ("const-idx", g_const, (tiles,)),
        ("arg-idx", g_arg, (tiles, jnp.asarray(idx_np))),
    ]:
        t0 = time.time()
        c = jax.jit(fn).lower(*args).compile()
        try:
            size = len(c.runtime_executable().serialize())
        except Exception as e:
            size = f"? ({e})"
        print(f"{name}: compile {time.time()-t0:.1f}s "
              f"exec_size={size}", file=sys.stderr)


if __name__ == "__main__":
    main()
