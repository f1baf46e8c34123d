"""CLIP checkpoint IO.

Parity with /root/reference/llm/clip/io.py: loads OpenAI's ViT-B/32 ``.pt``
(a zip) by raw-byte extraction through a JSON index sidecar, maps the
24-tuple per resblock for both encoders (transposed torch Linear weights),
and round-trips finetuned parameters by dotted ``_parameters`` names.

This sandbox has no network egress, so ``Params`` raises a clear error when
the checkpoint is absent instead of downloading.
"""
from __future__ import annotations

import json
import os
import zipfile

import numpy as np

import pydynet_tpu as pdn

from .model import CLIP


def download(url: str, filename: str, chunk_size: int = 10**6) -> None:
    """Fetch a checkpoint (reference io.py:12-29); only usable in
    environments with network egress."""
    import urllib.request

    directories = os.path.dirname(filename)
    if directories:
        os.makedirs(directories, exist_ok=True)
    with urllib.request.urlopen(url, timeout=15) as response:
        total = int(response.info().get("Content-Length", 0) or 0)
        buf = b""
        while True:
            data = response.read(chunk_size)
            if not data:
                break
            buf += data
            if total:
                print(f"Downloading {filename} "
                      f"{len(buf) / total * 100:.2f} %")
    with open(filename, "wb") as f:
        f.write(buf)


def load_zip(path: str):
    files = {}
    with zipfile.ZipFile(path) as z:
        for info in z.infolist():
            with z.open(info) as f:
                files[info.filename] = f.read()
    return files


class Params:
    """Raw-byte reader over the ViT-B/32 .pt zip + JSON tensor index."""

    MODEL_URLS = {
        "ViT-B/32":
        "https://openaipublic.azureedge.net/clip/models/"
        "40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/"
        "ViT-B-32.pt",
    }

    def __init__(self, name: str, download_root: str = None) -> None:
        assert name in self.MODEL_URLS, f"Model {name} not supported."
        model_url = self.MODEL_URLS[name]  # before the filename mangling
        name = name.replace("/", "-")
        if download_root is None:
            download_root = os.environ.get(
                "CLIP_DIR", os.path.expanduser("~/.cache/clip"))
        model_path = os.path.join(download_root, f"{name}.pt")
        index_path = os.path.join(download_root, f"{name}.json")
        # auto-download is opt-in: in offline sandboxes a blackholed DNS
        # lookup can stall for minutes before failing
        if not os.path.isfile(model_path) and os.environ.get(
                "PYDYNET_TPU_ALLOW_DOWNLOAD") == "1":
            try:
                print(f"Downloading {model_path}")
                download(model_url, model_path)
            except Exception as e:  # surface the reason, keep going to the
                print(f"Download failed: {type(e).__name__}: {e}")  # raise
        self._tensors = None
        if os.path.isfile(model_path) and not os.path.isfile(index_path):
            # the JSON byte-offset sidecar is a reference-repo artifact
            # nothing regenerates; the .pt is a TorchScript archive, so when
            # torch (cpu) is available read the tensors from it directly —
            # this makes the download path usable end-to-end
            self._tensors = self._load_with_torch(model_path)
            if self._tensors is not None:
                self.files, self.info = None, None
                return
        if not (os.path.isfile(model_path) and os.path.isfile(index_path)):
            raise FileNotFoundError(
                f"CLIP checkpoint not found at {model_path} (+ JSON index). "
                "Set PYDYNET_TPU_ALLOW_DOWNLOAD=1 to fetch it (needs network "
                "egress), place the files there manually, or run the CLIs "
                "with --random-init.")
        self.files = load_zip(model_path)
        with open(index_path) as f:
            self.info = json.load(f)

    @staticmethod
    def _load_with_torch(path):
        try:
            import torch

            sd = torch.jit.load(path, map_location="cpu").state_dict()
            return {k: v.detach().float().numpy() for k, v in sd.items()}
        except Exception as e:
            print(f"torch fallback load failed: {type(e).__name__}: {e}")
            return None

    def __getitem__(self, name: str) -> np.ndarray:
        if self._tensors is not None:
            return np.asarray(self._tensors[name], np.float32)
        info = self.info[name]
        data = self.files[info["path"]][info["start"]:info["end"]]
        arr = np.frombuffer(data, dtype=info["dtype"]).reshape(info["shape"])
        return arr.astype(np.float32)


@pdn.no_grad()
def load_model(model: CLIP, param) -> CLIP:
    def put(name, value):
        model._parameters[name].data = np.ascontiguousarray(value)

    model.scale = float(np.exp(param["logit_scale"].astype(np.float32)))
    put("class_embed", param["visual.class_embedding"].reshape(1, 1, -1))
    put("v_pos_emb", param["visual.positional_embedding"])
    put("t_pos_emb", param["positional_embedding"])

    put("image_encoder.kernel", param["visual.conv1.weight"])
    put("image_encoder.pre_norm.scale", param["visual.ln_pre.weight"])
    put("image_encoder.pre_norm.shift", param["visual.ln_pre.bias"])
    put("image_encoder.post_norm.scale", param["visual.ln_post.weight"])
    put("image_encoder.post_norm.shift", param["visual.ln_post.bias"])
    put("image_encoder.proj.weight", param["visual.proj"])

    put("text_encoder.token_embed.weight", param["token_embedding.weight"])
    put("text_encoder.post_norm.scale", param["ln_final.weight"])
    put("text_encoder.post_norm.shift", param["ln_final.bias"])
    put("text_encoder.proj.weight", param["text_projection"])

    per_block = [
        ("mha.QKV.weight", "attn.in_proj_weight", True),
        ("mha.QKV.bias", "attn.in_proj_bias", False),
        ("mha.O.weight", "attn.out_proj.weight", True),
        ("mha.O.bias", "attn.out_proj.bias", False),
        ("layer_norm1.scale", "ln_1.weight", False),
        ("layer_norm1.shift", "ln_1.bias", False),
        ("layer_norm2.scale", "ln_2.weight", False),
        ("layer_norm2.shift", "ln_2.bias", False),
        ("mlp.fc1.weight", "mlp.c_fc.weight", True),
        ("mlp.fc1.bias", "mlp.c_fc.bias", False),
        ("mlp.fc2.weight", "mlp.c_proj.weight", True),
        ("mlp.fc2.bias", "mlp.c_proj.bias", False),
    ]
    for i in range(12):
        for ours, theirs, transpose in per_block:
            v = param[f"visual.transformer.resblocks.{i}.{theirs}"]
            put(f"image_encoder.transformers.{i}.{ours}",
                v.T if transpose else v)
            t = param[f"transformer.resblocks.{i}.{theirs}"]
            put(f"text_encoder.transformers.{i}.{ours}",
                t.T if transpose else t)
    return model


@pdn.no_grad()
def save_finetuned_parameters(model: CLIP, output_path: str):
    params = {
        name: param.numpy()
        for name, param in model._parameters.items() if param.requires_grad
    }
    # file-object write: bare np.savez appends '.npz' to extensionless
    # paths, breaking save/load round trips through the same path string
    with open(output_path, "wb") as f:
        np.savez(f, **params)


@pdn.no_grad()
def load_finetuned_parameters(model: CLIP, finetuned_path: str) -> CLIP:
    if not os.path.exists(finetuned_path) \
            and os.path.exists(finetuned_path + ".npz"):
        finetuned_path += ".npz"  # blobs written by np.savez's auto-suffix
    with np.load(finetuned_path) as weights:
        for name, param in model._parameters.items():
            if name in weights:
                param.data = weights[name]
    return model
