"""Bag-of-words place recognition over ORB descriptors.

Reference: examples/bag-of-words (+ convert/load_orbvoc).

    python examples/bag_of_words.py [--images a.png b.png ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
from examples._common import DOG_JPEG, base_parser, configure_backend


def main():
    p = base_parser(__doc__)
    p.add_argument("--images", nargs="*", default=None)
    p.add_argument("--vocab-k", type=int, default=8)
    p.add_argument("--vocab-depth", type=int, default=3)
    p.add_argument("--save-vocab", default=None)
    args = p.parse_args()
    configure_backend(args)

    import numpy as np
    import cv2
    import jax.numpy as jnp

    from kornia_tpu import bow
    from kornia_tpu import io as kio
    from kornia_tpu.features import orb
    from kornia_tpu.ops import color

    if args.images:
        frames = [kio.read_image_any_gray8(f)[:, :, 0]
                  for f in args.images]
    else:
        # crops of the default image as pseudo-places
        img = kio.read_image_any_rgb8(DOG_JPEG)
        gray = np.asarray(color.rgb_to_gray(jnp.asarray(img)))[..., 0]
        big = cv2.resize(gray, (512, 512))
        frames = [big[:256, :256], big[:256, 256:],
                  big[256:, :256], big[256:, 256:]]
    print(f"{len(frames)} places")

    cfg = orb.OrbConfig(n_features=256, n_levels=3)
    descs = []
    for f in frames:
        ft = orb.orb_detect_and_describe(jnp.asarray(f), cfg)
        bits = np.asarray(ft.descriptors)[np.asarray(ft.mask)]
        descs.append(np.packbits(bits.astype(np.uint8), axis=1))

    vocab = bow.Vocabulary.build(
        np.concatenate(descs), k=args.vocab_k, depth=args.vocab_depth)
    print(f"vocabulary: {vocab.n_words} words")
    if args.save_vocab:
        vocab.save(args.save_vocab)
        print(f"saved {args.save_vocab}")

    db = bow.BowDatabase(vocab)
    for d in descs:
        db.add(d)
    for i, d in enumerate(descs):
        res = db.query(d, top_k=2)
        second = (f", runner-up {res[1].entry_id} ({res[1].score:.3f})"
                  if len(res) > 1 else "")
        print(f"query place {i}: best {res[0].entry_id} "
              f"({res[0].score:.3f}){second}")


if __name__ == "__main__":
    main()
