"""Hand-built torch reference implementations for numeric parity tests.

These re-implement the *behavior* of the reference models (torchvision
SwinTransformerBlock V1 internals, reference waifu2x/iw3 model topologies)
in plain torch so that torch->flax weight conversion can be verified
numerically without torchvision or downloaded checkpoints.  They are specs,
not copies: written from the published algorithm definitions.
"""
