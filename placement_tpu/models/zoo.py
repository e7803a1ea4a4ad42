"""The ten reference policy architectures as one configurable Flax module.

Reference classes (agent/models/) -> presets here (registry names match
utils/agent/utils.py:62-74):

  square                              SquareModel (square_model.py:14)
  rectangle                           RectangleModel (rectangle_model.py:13)
  rectangle_factorized                RectangleFactorizedModel (rectangle_model_factorized.py:12)
  rectangle_pin                       RectanglePinModel (rectangle_pin_model.py:13)
  rectangle_pin_attn_component        RectanglePinAttnCompModel
  rectangle_pin_attn_all              RectanglePinAttnCompPinModel
  rectangle_factorized_pin            RectanglePinFactorizedModel
  rectangle_pin_all_attn_factorized   RectanglePinAllAttnFactorized
  rectangle_pin_attn_all_no_grid      RectanglePinAttnAllNoGridModel
  rectangle_spatial_pin               RectanglePinSpatialModel

All observations arrive batched [B, ...] in the env's obs-dict layout.
Joint-head presets return masked logits over the flattened (orientation, x,
y) action space plus a value; factorized presets return the encoding plus a
value, with per-factor logit heads exposed as extra apply methods for the
factorized action distributions.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from placement_tpu.models.blocks import ConvBlocks, SelfAttention, mask_logits


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Union of the reference's custom_model_config fields
    (agent/config/*.json)."""

    model_type: str = "rectangle_pin"
    height: int = 10
    width: int = 10
    num_orientations: int = 4
    max_num_components: int = 5
    max_num_nets: int = 3
    max_num_pins_per_component: int = 4
    component_feature_vector_width: int = 5
    pin_feature_vector_width: int = 8
    num_conv_blocks: int = 2
    num_conv_filters: int = 3
    conv_kernel_size: int = 3
    activation: str = "relu"
    max_pool: bool = False
    max_pool_kernel_size: int = 2
    component_feature_encoding_dimension: int = 16
    pin_feature_encoding_dimension: int = 16
    attn_hidden_size: int = 16
    attn_hidden_size_pin: int = 16
    # spatial-model extras (rectangle_pin_spatial_model config)
    num_conv_blocks_component_grid: int = 1
    num_conv_filters_component_grid: int = 3
    conv_kernel_size_component_grid: int = 3
    activation_component_grid: str = "relu"
    max_pool_component_grid: bool = False
    max_pool_kernel_size_component_grid: int = 3
    conv_padding_component_grid: str = "SAME"
    component_attn_hidden_size: int = 16
    # factorized extras
    factorization: str = "orientation"  # "orientation" | "coordinates"
    use_batch_norm: bool = True

    @property
    def is_factorized(self) -> bool:
        return self.model_type in ("rectangle_factorized",
                                   "rectangle_factorized_pin",
                                   "rectangle_pin_all_attn_factorized")

    @property
    def num_actions(self) -> int:
        if self.model_type == "square":
            return self.height * self.width
        return self.num_orientations * self.height * self.width


class PlacementModel(nn.Module):
    """One module, ten presets — encoder chosen by cfg.model_type."""

    cfg: ModelConfig

    def setup(self) -> None:
        cfg = self.cfg
        self.grid_conv = ConvBlocks(
            cfg.num_conv_blocks, cfg.num_conv_filters, cfg.conv_kernel_size,
            cfg.activation, cfg.max_pool, cfg.max_pool_kernel_size,
            use_batch_norm=cfg.use_batch_norm, name="grid_conv")

        t = cfg.model_type
        if t in ("rectangle", "rectangle_factorized"):
            self.flat_feature_dense = nn.Dense(
                cfg.component_feature_encoding_dimension,
                name="flat_feature_dense")
            self.flat_feature_norm = nn.BatchNorm(
                momentum=0.99, epsilon=1e-3, name="flat_feature_norm")

        if t.startswith("rectangle_pin") or t == "rectangle_factorized_pin":
            self.component_dense = nn.Dense(
                cfg.component_feature_encoding_dimension,
                name="component_dense")
            self.pin_dense = nn.Dense(cfg.pin_feature_encoding_dimension,
                                      name="pin_dense")
            if t in ("rectangle_pin_attn_all",
                     "rectangle_pin_attn_all_no_grid",
                     "rectangle_pin_all_attn_factorized"):
                self.pin_q = nn.Dense(cfg.attn_hidden_size_pin, name="pin_q")
                self.pin_k = nn.Dense(cfg.attn_hidden_size_pin, name="pin_k")
                self.pin_v = nn.Dense(cfg.attn_hidden_size_pin, name="pin_v")
            if t in ("rectangle_pin_attn_component", "rectangle_pin_attn_all",
                     "rectangle_pin_attn_all_no_grid",
                     "rectangle_pin_all_attn_factorized"):
                self.comp_attn = SelfAttention(cfg.attn_hidden_size,
                                               name="comp_attn")

        if t == "rectangle_spatial_pin":
            self.pin_grid_conv = ConvBlocks(
                cfg.num_conv_blocks, cfg.num_conv_filters,
                cfg.conv_kernel_size, cfg.activation, cfg.max_pool,
                cfg.max_pool_kernel_size, use_batch_norm=cfg.use_batch_norm,
                name="pin_grid_conv")
            self.component_grid_conv = ConvBlocks(
                cfg.num_conv_blocks_component_grid,
                cfg.num_conv_filters_component_grid,
                cfg.conv_kernel_size_component_grid,
                cfg.activation_component_grid,
                cfg.max_pool_component_grid,
                cfg.max_pool_kernel_size_component_grid,
                padding=cfg.conv_padding_component_grid.upper(),
                use_batch_norm=cfg.use_batch_norm,
                name="component_grid_conv")
            self.spatial_comp_attn = SelfAttention(
                cfg.component_attn_hidden_size, name="spatial_comp_attn")

        if cfg.is_factorized:
            self.orientation_head = nn.Dense(cfg.num_orientations,
                                             name="orientation_head")
            self.x_head = nn.Dense(cfg.height, name="x_head")
            self.y_head = nn.Dense(cfg.width, name="y_head")
        else:
            self.logits_head = nn.Dense(cfg.num_actions, name="logits_head")
        self.value_head = nn.Dense(1, name="value_head")

    # -- encoders ----------------------------------------------------------

    def _encode_grid(self, grid, train):
        x = self.grid_conv(grid, train=train)
        return x.reshape(x.shape[0], -1)

    def _encode_rect_features(self, obs, train):
        """RectangleModel.preprocess + encode_flattened_component_feature
        (rectangle_model.py:104-163): zero placed components, flatten,
        Dense+BN+relu."""
        feat = obs["all_components_feature"]
        keep = (obs["placement_mask"] == 0).astype(feat.dtype)
        masked = feat * keep[..., None]
        x = masked.reshape(masked.shape[0], -1)
        x = self.flat_feature_dense(x)
        x = self.flat_feature_norm(x, use_running_average=not train)
        return jax.nn.relu(x)

    def _pin_tokens(self, obs):
        """One-hot the pin net id and concat with numeric features
        (rectangle_pin_model.py:234-287) -> [B, C, ppc, 4 + nets + 1]."""
        num = obs["all_pins_num_feature"]
        cat = obs["all_pins_cat_feature"][..., 0].astype(jnp.int32)
        onehot = jax.nn.one_hot(cat, self.cfg.max_num_nets + 1,
                                dtype=num.dtype)
        return jnp.concatenate([num, onehot], axis=-1)

    def _encode_pin_components(self, obs, train):
        """RectanglePinModel encoding stack -> [B, C, D] token matrix
        (rectangle_pin_model.py:132-232)."""
        cfg = self.cfg
        comp_enc = self.component_dense(obs["all_components_feature"])
        pins = self._pin_tokens(obs)                       # [B, C, ppc, F]
        pin_enc = self.pin_dense(pins)                     # [B, C, ppc, E]
        if cfg.model_type in ("rectangle_pin_attn_all",
                              "rectangle_pin_attn_all_no_grid",
                              "rectangle_pin_all_attn_factorized"):
            # per-component pin self-attention, flattened
            # (rectangle_pin_attn_component_pin_model.py:120-171)
            q, k, v = self.pin_q(pin_enc), self.pin_k(pin_enc), self.pin_v(pin_enc)
            w = jax.nn.softmax(jnp.einsum(
                "bcqd,bckd->bcqk", q, k,
                preferred_element_type=jnp.float32), axis=-1)
            att = jax.nn.relu(jnp.einsum(
                "bcqk,bckd->bcqd", w, v,
                preferred_element_type=jnp.float32))
            pin_pooled = att.reshape(att.shape[0], att.shape[1], -1)
        else:
            # shared dense then sum-pool over pins (:186-217)
            pin_pooled = jnp.sum(pin_enc, axis=2)
        mask_onehot = jax.nn.one_hot(
            obs["placement_mask"].astype(jnp.int32), 4, dtype=comp_enc.dtype)
        tokens = jnp.concatenate([comp_enc, pin_pooled, mask_onehot], axis=-1)
        if cfg.model_type in ("rectangle_pin_attn_component",
                              "rectangle_pin_attn_all",
                              "rectangle_pin_attn_all_no_grid",
                              "rectangle_pin_all_attn_factorized"):
            tokens = self.comp_attn(tokens)
        return tokens

    def _encode_spatial(self, obs, train):
        """RectanglePinSpatialModel encodings
        (rectangle_pin_spatial_model.py:95-230)."""
        b = obs["grid"].shape[0]
        ge = self._encode_grid(obs["grid"], train)
        pe = self.pin_grid_conv(obs["pin_grid"], train=train)
        pe = pe.reshape(b, -1)
        cgrid = obs["component_grid"]                      # [B, C, h, w, ch]
        bc = cgrid.reshape((-1,) + cgrid.shape[2:])
        ce = self.component_grid_conv(bc, train=train)
        ce = ce.reshape(b, cgrid.shape[1], -1)
        mask_onehot = jax.nn.one_hot(
            obs["placement_mask"].astype(jnp.int32), 4, dtype=ce.dtype)
        tokens = jnp.concatenate([ce, mask_onehot], axis=-1)
        tokens = self.spatial_comp_attn(tokens)
        return jnp.concatenate([ge, pe, tokens.reshape(b, -1)], axis=-1)

    def encode(self, obs, train: bool = False) -> jnp.ndarray:
        """Full encoding vector for the configured preset."""
        cfg = self.cfg
        t = cfg.model_type
        if t == "square":
            return self._encode_grid(obs["grid"], train)
        if t in ("rectangle", "rectangle_factorized"):
            ge = self._encode_grid(obs["grid"], train)
            fe = self._encode_rect_features(obs, train)
            return jnp.concatenate([ge, fe], axis=-1)
        if t == "rectangle_spatial_pin":
            return self._encode_spatial(obs, train)
        tokens = self._encode_pin_components(obs, train)
        flat = tokens.reshape(tokens.shape[0], -1)
        if t == "rectangle_pin_attn_all_no_grid":
            # drops the grid encoding (rectangle_pin_attn_all_model_no_grid.py:63-64)
            return flat
        ge = self._encode_grid(obs["grid"], train)
        return jnp.concatenate([ge, flat], axis=-1)

    # -- heads -------------------------------------------------------------

    def __call__(self, obs, train: bool = False):
        enc = self.encode(obs, train)
        value = self.value_head(enc)[..., 0]
        if self.cfg.is_factorized:
            return {"encoding": enc, "value": value}
        logits = self.logits_head(enc)
        flat_mask = obs["action_mask"].reshape(logits.shape[0], -1)
        return {"logits": mask_logits(logits, flat_mask), "value": value}

    def init_all(self, obs, train: bool = False) -> jnp.ndarray:
        """__call__ plus a dummy pass through the factorized heads so that
        ``init`` creates every parameter (heads are only exercised lazily by
        the action distribution otherwise)."""
        out = self(obs, train=train)
        if self.cfg.is_factorized:
            enc = out["encoding"]
            b = enc.shape[0]
            oh = jnp.zeros((b, self.cfg.num_orientations), enc.dtype)
            xn = jnp.zeros((b,), enc.dtype)
            yn = jnp.zeros((b,), enc.dtype)
            _ = self.o_logits(enc, xn, yn)
            _ = self.x_logits(enc, oh)
            _ = self.y_logits(enc, oh, xn)
        return out

    # factorized heads (rectangle_model_factorized.py:133-311); called via
    # module.apply(vars, ..., method="o_logits") etc.
    def o_logits(self, enc, x_norm=None, y_norm=None) -> jnp.ndarray:
        if self.cfg.factorization == "orientation":
            return self.orientation_head(enc)
        return self.orientation_head(
            jnp.concatenate([enc, x_norm[..., None], y_norm[..., None]], -1))

    def x_logits(self, enc, onehot_o=None) -> jnp.ndarray:
        if self.cfg.factorization == "orientation":
            return self.x_head(jnp.concatenate([enc, onehot_o], -1))
        return self.x_head(enc)

    def y_logits(self, enc, onehot_o=None, x_norm=None) -> jnp.ndarray:
        if self.cfg.factorization == "orientation":
            return self.y_head(jnp.concatenate(
                [enc, onehot_o, x_norm[..., None]], -1))
        return self.y_head(jnp.concatenate([enc, x_norm[..., None]], -1))


MODEL_REGISTRY = (
    "square", "rectangle", "rectangle_factorized", "rectangle_pin",
    "rectangle_pin_attn_component", "rectangle_pin_attn_all",
    "rectangle_factorized_pin", "rectangle_pin_all_attn_factorized",
    "rectangle_pin_attn_all_no_grid", "rectangle_spatial_pin")


def build_model(cfg: ModelConfig) -> PlacementModel:
    if cfg.model_type not in MODEL_REGISTRY:
        raise KeyError(f"unknown model type {cfg.model_type!r}")
    return PlacementModel(cfg)
