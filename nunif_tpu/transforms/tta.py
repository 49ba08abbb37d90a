"""8-way test-time augmentation (reference: nunif/transforms/tta.py:20-49).

NHWC (H axis -3, W axis -2).  ``tta_split`` returns the 8 dihedral-group
transforms; ``tta_merge`` inverts each and averages.
"""
import jax.numpy as jnp


def _hflip(x):
    return jnp.flip(x, axis=-2)


def _vflip(x):
    return jnp.flip(x, axis=-3)


def _tr(x):
    return jnp.rot90(x, 1, axes=(-3, -2))


def _itr(x):
    return jnp.rot90(x, -1, axes=(-3, -2))


def tta_split(x):
    xv = _vflip(x)
    xt = _tr(x)
    xtv = _vflip(xt)
    return (x, _hflip(x), xv, _hflip(xv),
            xt, _hflip(xt), xtv, _hflip(xtv))


def tta_merge(xs):
    (x, x_h, x_v, x_vh, x_t, x_th, x_tv, x_tvh) = xs
    avg = (x + _hflip(x_h) + _vflip(x_v) + _vflip(_hflip(x_vh))
           + _itr(x_t) + _itr(_hflip(x_th)) + _itr(_vflip(x_tv))
           + _itr(_vflip(_hflip(x_tvh)))) / 8.0
    return jnp.clip(avg, 0.0, 1.0)


def tta_render(renderer, x, tile_size=None, batch_size=None):
    """8-way TTA through a TiledRenderer (reference waifu2x/utils.py:218-254)."""
    outs = [renderer.render(xx, tile_size=tile_size, batch_size=batch_size)
            for xx in tta_split(x)]
    return tta_merge(outs)
