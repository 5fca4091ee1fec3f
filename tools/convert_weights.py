"""One-time conversion: reference TF checkpoints / .h5 → npz param packs.

Reads every released model under the reference's release_data tree and
writes nanocaller_tpu/models/params/<name>.npz (+ .coverage sidecar text
when present). Run once per refresh:

    python tools/convert_weights.py

Variable layouts verified against the checkpoints directly
(tf.train.load_checkpoint): TF object-checkpoint keys are attribute
paths like 'conv1_1/kernel/.ATTRIBUTES/VARIABLE_VALUE'; Keras .h5 files
key by layer display name (C1_1..C7). Kernel layouts (HWIO conv, IO
dense) match flax exactly — no transposes needed.
"""

import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/nanocaller_src"
OUT = os.path.join(REPO, "nanocaller_tpu", "models", "params")

# name → relative ckpt prefix (mirrors snpCaller.py:16-34, indelCaller.py:17-24)
SNP_MODELS = {
    "NanoCaller1": "release_data/ONT_models/SNPs/NanoCaller1_beta/model-rt-1",
    "NanoCaller2": "release_data/ONT_models/SNPs/NanoCaller1_beta/model-rt-1",
    "NanoCaller3": "release_data/clr_models/SNPs/NanoCaller3_beta/model-rt-100",
    "ONT-HG001": "release_data/ONT_models/SNPs/HG001_guppy4.2.2_giab-3.3.2/model-1",
    "ONT-HG001_GP2.3.8": "release_data/ONT_models/SNPs/HG001_guppy2.3.8_giab-3.3.2/model-100",
    "ONT-HG001_GP2.3.8-4.2.2": "release_data/ONT_models/SNPs/HG001_guppy2.3.8_guppy4.2.2_giab-3.3.2/model-100",
    "ONT-HG001-4_GP4.2.2": "release_data/ONT_models/SNPs/HG001_guppy4.2.2_giab-3.3.2_HG002-4_guppy4.2.2_giab-4.2.1/model-100",
    "ONT-HG002": "release_data/ONT_models/SNPs/HG002_guppy4.2.2_giab-4.2.1/model-100",
    "ONT-HG002_GP4.2.2_v3.3.2": "release_data/ONT_models/SNPs/HG002_guppy4.2.2_giab-3.3.2/model-100",
    "ONT-HG002_GP2.3.4_v3.3.2": "release_data/ONT_models/SNPs/HG002_guppy2.3.4_giab-3.3.2/model-100",
    "ONT-HG002_GP2.3.4_v4.2.1": "release_data/ONT_models/SNPs/HG002_guppy2.3.4_giab-4.2.1/model-100",
    "ONT-HG002_r10.3": "release_data/ONT_models/SNPs/HG002_r10.3_guppy4.0.11_giab-4.2.1/model-100",
    "ONT-HG002_bonito": "release_data/ONT_models/SNPs/HG002_bonito_giab-4.2.1/model-100",
    "CCS-HG001": "release_data/hifi_models/SNPs/HG001_giab-3.3.2/model-100",
    "CCS-HG002": "release_data/hifi_models/SNPs/HG002_giab-4.2.1/model-100",
    "CCS-HG001-4": "release_data/hifi_models/SNPs/HG001_giab-3.3.2_HG002-4_giab-4.2.1/model-100",
    "CLR-HG002": "release_data/clr_models/SNPs/HG002_giab-4.2.1/model-100",
}
SNP_H5 = {"haploid": "release_data/haploid_models/SNPs/CHM13/model.24-0.9985.h5"}

INDEL_MODELS = {
    "NanoCaller1": "release_data/ONT_models/indels/NanoCaller1_beta/model-30",
    "NanoCaller3": "release_data/hifi_models/indels/NanoCaller3_beta/model-25",
    "ONT-HG001": "release_data/ONT_models/indels/HG001_guppy4.2_giab-3.3.2/model-100",
    "ONT-HG002": "release_data/ONT_models/indels/HG002_guppy4.2_giab-4.2.1/model-100",
    "CCS-HG001": "release_data/hifi_models/indels/HG001_giab-3.3.2/model-100",
    "CCS-HG002": "release_data/hifi_models/indels/HG002_giab-4.2.1/model-100",
}
INDEL_H5 = {"haploid": "release_data/haploid_models/indels/CHM13/model.19-0.9811.h5"}

# .h5 layer display name → flax module name
H5_NAME_MAP = {
    "C1_1": "conv1_1", "C1_2": "conv1_2", "C1_3": "conv1_3",
    "C2": "conv2", "C3": "conv3",
    "C4": "fc1", "C5": "fc2", "C6": "fc2", "C7": "fc3",
}
# haploid SNP h5 has C4/C6/C7 (fc1/fc2/fc3); haploid indel has C4/C5/C6
H5_MAP_SNP = {**H5_NAME_MAP, "C6": "fc2", "C7": "fc3"}
H5_MAP_INDEL = {**H5_NAME_MAP, "C5": "fc2", "C6": "fc3"}


def convert_ckpt(prefix):
    import tensorflow as tf

    reader = tf.train.load_checkpoint(prefix)
    out = {}
    for key in reader.get_variable_to_shape_map():
        if not key.endswith("/.ATTRIBUTES/VARIABLE_VALUE"):
            continue
        name = key[: -len("/.ATTRIBUTES/VARIABLE_VALUE")]
        layer, var = name.rsplit("/", 1)
        # reference attribute names match our flax names except the heads
        out["%s/%s" % (layer, var)] = reader.get_tensor(key)
    return out


def convert_h5(path, name_map):
    import h5py

    out = {}
    with h5py.File(path, "r") as f:
        def visit(name, obj):
            if not hasattr(obj, "shape") or obj.shape is None:
                return
            top = name.split("/")[0]
            var = name.split("/")[-1].split(":")[0]
            flax_name = name_map.get(top)
            if flax_name is None:
                raise KeyError("unmapped h5 layer %s" % name)
            out["%s/%s" % (flax_name, var)] = np.array(obj)
        f.visititems(visit)
    return out


def write_pack(name, flat, kind, coverage_src=None):
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "%s_%s.npz" % (kind, name))
    np.savez_compressed(path, **flat)
    if coverage_src and os.path.exists(coverage_src):
        shutil.copyfile(coverage_src, path.replace(".npz", ".coverage"))
    print("wrote", path, "(%d arrays)" % len(flat))


def main():
    for name, rel in SNP_MODELS.items():
        prefix = os.path.join(REF, rel)
        flat = convert_ckpt(prefix)
        write_pack(name, flat, "snp", coverage_src=prefix + ".coverage")
    for name, rel in SNP_H5.items():
        flat = convert_h5(os.path.join(REF, rel), H5_MAP_SNP)
        write_pack(name, flat, "snp")
    for name, rel in INDEL_MODELS.items():
        prefix = os.path.join(REF, rel)
        flat = convert_ckpt(prefix)
        write_pack(name, flat, "indel", coverage_src=prefix + ".coverage")
    for name, rel in INDEL_H5.items():
        flat = convert_h5(os.path.join(REF, rel), H5_MAP_INDEL)
        write_pack(name, flat, "indel")


if __name__ == "__main__":
    main()
