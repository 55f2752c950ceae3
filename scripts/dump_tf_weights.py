#!/usr/bin/env python
"""Dump a reference TF2 SavedModel/checkpoint's variables to .npz.

Run this WHERE TENSORFLOW IS INSTALLED (it is not in this repo's
environment); the output feeds `yolov3_tpu.utils.tf_import.load_npz`,
making reference-weight parity a one-command measurement:

  # on a TF machine:
  python scripts/dump_tf_weights.py --saved_model <ref_out>/saved_model \
      --output ref_weights.npz
  # here:
  python -c "
  from yolov3_tpu.utils.tf_import import load_npz
  params, stats = load_npz('ref_weights.npz')
  ..."

Keys are `{layer_name}/{variable_suffix}` (e.g. `conv2d_3/kernel`,
`batch_normalization_3/moving_mean`, `feature_map_1/bias`), exactly the
keras layout `tf_import.reference_keras_shapes` describes.
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--saved_model", type=str, default=None,
                   help="path to the reference's exported saved_model dir")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="alternatively: a tf.train.Checkpoint prefix "
                        "(output/checkpoint/ckpt)")
    p.add_argument("--output", type=str, required=True)
    args = p.parse_args(argv)

    import numpy as np
    import tensorflow as tf  # only available on the dumping machine

    out = {}
    if args.saved_model:
        model = tf.saved_model.load(args.saved_model)
        variables = model.variables
        for v in variables:
            # v.name like "conv2d_3/kernel:0"
            out[v.name.split(":")[0]] = v.numpy()
    elif args.checkpoint:
        reader = tf.train.load_checkpoint(args.checkpoint)
        for key in reader.get_variable_to_shape_map():
            # checkpoint object paths: model/layer-N/kernel/.ATTRIBUTES/...
            if ".ATTRIBUTES" not in key or "optimizer" in key:
                continue
            tensor = reader.get_tensor(key)
            out[key] = np.asarray(tensor)
        print("NOTE: checkpoint dumps use object paths; prefer "
              "--saved_model, whose variable names carry layer names.")
    else:
        raise SystemExit("one of --saved_model / --checkpoint is required")

    np.savez(args.output, **out)
    print(f"wrote {len(out)} variables to {args.output}")


if __name__ == "__main__":
    main()
