"""Prompt mining: CLIP zero-shot retrieval of colors + clothing items.

Rebuild of the reference's BestEmbeddings
(/root/reference/model/utils.py:647-684): embed the clothes image and the
text phrase banks with CLIP, softmax image↔text logits, take the top-2
colors and top-2 clothing items, and emit
"edgestyle, <c1, c2, i1, i2>" — the trigger-word prompt format the model
was trained with. The phrase banks below are our own equivalents of the
reference's COLORS (:183-452) and CLOTHING_ITEMS (:455-644) vocabularies.

The scoring path (text-bank embedding is computed once; per-image it is a
single 224px CLIP vision forward + one matmul) runs fully jitted.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

TRIGGER_WORD = "edgestyle"

_BASE_COLORS = [
    "black", "white", "gray", "charcoal", "silver", "red", "crimson", "scarlet",
    "maroon", "burgundy", "wine", "brick", "rust", "orange", "tangerine", "coral",
    "salmon", "peach", "apricot", "amber", "yellow", "gold", "mustard", "lemon",
    "cream", "ivory", "beige", "khaki", "tan", "camel", "brown", "chocolate",
    "coffee", "taupe", "olive", "green", "emerald", "forest green", "lime",
    "mint", "sage", "teal", "turquoise", "aqua", "cyan", "sky blue", "blue",
    "navy", "royal blue", "cobalt", "denim", "indigo", "violet", "purple",
    "lavender", "lilac", "plum", "magenta", "fuchsia", "pink", "rose", "blush",
    "hot pink", "pastel pink", "pastel blue", "pastel green", "pastel yellow",
]
_COLOR_MODIFIERS = ["", "light ", "dark ", "bright "]
COLORS: List[str] = [m + c for c in _BASE_COLORS for m in _COLOR_MODIFIERS]

CLOTHING_ITEMS: List[str] = [
    # tops
    "t-shirt", "shirt", "dress shirt", "polo shirt", "henley shirt", "flannel shirt",
    "oxford shirt", "button-down shirt", "linen shirt", "silk shirt", "denim shirt",
    "hawaiian shirt", "rugby shirt", "baseball tee", "ringer tee", "long sleeve shirt",
    "short sleeve shirt", "graphic tee", "striped shirt", "plaid shirt", "peasant top",
    "blouse", "ruffled blouse", "wrap top", "halter top", "off-shoulder top",
    "one-shoulder top", "tank top", "crop top", "tube top", "camisole", "bodysuit",
    "bustier", "corset top", "peplum top", "mesh top", "lace top", "sequin top",
    # knitwear
    "sweater", "pullover", "turtleneck", "mock neck sweater", "v-neck sweater",
    "crewneck sweater", "cable knit sweater", "chunky knit sweater", "mohair sweater",
    "cashmere sweater", "argyle sweater", "fair isle sweater", "cardigan",
    "long cardigan", "cropped cardigan", "shrug", "bolero", "sweatshirt", "hoodie",
    "zip-up hoodie", "cropped hoodie", "fleece pullover", "half-zip pullover",
    "knit vest", "sweater vest",
    # outerwear
    "vest", "puffer vest", "quilted vest", "jacket", "denim jacket",
    "leather jacket", "moto jacket", "bomber jacket", "varsity jacket",
    "track jacket", "utility jacket", "field jacket", "shacket", "blazer",
    "double-breasted blazer", "suit jacket", "tuxedo jacket", "windbreaker",
    "anorak", "raincoat", "trench coat", "overcoat", "topcoat", "duster coat",
    "wool coat", "wrap coat", "cocoon coat", "parka", "puffer jacket",
    "down jacket", "quilted jacket", "peacoat", "duffle coat", "car coat",
    "fur coat", "faux fur coat", "shearling jacket", "fleece jacket",
    "softshell jacket", "ski jacket", "poncho", "cape", "cloak", "kimono",
    "kaftan", "tunic", "smock",
    # dresses & one-pieces
    "dress", "maxi dress", "midi dress", "mini dress", "sundress", "shirt dress",
    "wrap dress", "slip dress", "sheath dress", "shift dress", "a-line dress",
    "bodycon dress", "fit and flare dress", "sweater dress", "pinafore dress",
    "halter dress", "strapless dress", "off-shoulder dress", "cocktail dress",
    "evening gown", "ball gown", "lace dress", "sequin dress", "velvet dress",
    "floral dress", "polka dot dress", "jumpsuit", "romper", "playsuit",
    "overalls", "dungarees", "boiler suit", "co-ord set",
    # bottoms
    "jeans", "skinny jeans", "ripped jeans", "straight leg jeans", "bootcut jeans",
    "flared jeans", "wide leg jeans", "boyfriend jeans", "mom jeans",
    "high-waisted jeans", "trousers", "dress pants", "pleated trousers", "chinos",
    "corduroy pants", "cargo pants", "joggers", "sweatpants", "track pants",
    "leggings", "yoga pants", "palazzo pants", "culottes", "capri pants",
    "paperbag pants", "leather pants", "shorts", "denim shorts", "cargo shorts",
    "bermuda shorts", "bike shorts", "athletic shorts", "pleated shorts",
    "skirt", "mini skirt", "midi skirt", "maxi skirt", "pleated skirt",
    "pencil skirt", "denim skirt", "wrap skirt", "a-line skirt", "tulle skirt",
    "leather skirt", "slit skirt", "skort",
    # sets, sport, sleep & swim
    "suit", "tuxedo", "tracksuit", "sportswear", "jersey", "football jersey",
    "basketball jersey", "uniform", "workwear", "scrubs", "pajamas", "nightgown",
    "bathrobe", "loungewear", "swimsuit", "one-piece swimsuit", "bikini",
    "swim trunks", "rash guard", "wetsuit", "leotard", "unitard",
    # accessories worn on the torso
    "scarf", "shawl", "pashmina", "tie", "bow tie", "suspenders", "apron",
]


def build_text_bank(tokenizer, encode_text_fn: Callable, phrases: Sequence[str],
                    template: str = "{}") -> jax.Array:
    """Embed a phrase bank → L2-normalized (N, D) text features."""
    ids = tokenizer([template.format(p) for p in phrases])
    emb = encode_text_fn(jnp.asarray(ids))
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)


class BestEmbeddings:
    """find_best(images01) → list of prompt strings.

    encode_image_fn: (B,224,224,3) CLIP-normalized → (B, D) image embeds.
    encode_text_fn:  (N,77) ids → (N, D) text embeds.
    Scoring matches the reference: logits = 100·imĝ·txt̂ᵀ, softmax over the
    bank, top-2 per bank (model/utils.py:665-684)."""

    def __init__(self, tokenizer, encode_image_fn, encode_text_fn,
                 colors: Sequence[str] = None, items: Sequence[str] = None):
        self.colors = list(colors or COLORS)
        self.items = list(items or CLOTHING_ITEMS)
        self.encode_image = encode_image_fn
        self.color_bank = build_text_bank(tokenizer, encode_text_fn, self.colors)
        self.item_bank = build_text_bank(tokenizer, encode_text_fn, self.items)

    @functools.partial(jax.jit, static_argnums=0)
    def _scores(self, pixel_values):
        img = self.encode_image(pixel_values)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        pc = jax.nn.softmax(100.0 * img @ self.color_bank.T, axis=-1)
        pi = jax.nn.softmax(100.0 * img @ self.item_bank.T, axis=-1)
        ci = jax.lax.top_k(pc, 2)[1]
        ii = jax.lax.top_k(pi, 2)[1]
        return ci, ii

    def find_best(self, pixel_values) -> List[str]:
        ci, ii = self._scores(pixel_values)
        ci, ii = np.asarray(ci), np.asarray(ii)
        prompts = []
        for b in range(ci.shape[0]):
            terms = [self.colors[ci[b, 0]], self.colors[ci[b, 1]],
                     self.items[ii[b, 0]], self.items[ii[b, 1]]]
            prompts.append(f"{TRIGGER_WORD}, " + ", ".join(terms))
        return prompts


class PromptMiner:
    """App-facing wrapper: raw [0,1] images → trigger prompts.

    Owns the tokenizer so callers can also encode the mined prompt
    (reference app.py:163: BestEmbeddings([clothes]) feeds the pipeline)."""

    def __init__(self, tokenizer, best: BestEmbeddings):
        self.tokenizer = tokenizer
        self.best = best

    def __call__(self, images01) -> List[str]:
        from edgestyle_tpu.models.clip_vision import clip_preprocess

        return self.best.find_best(clip_preprocess(jnp.asarray(images01)))


def build_prompt_miner(tokenizer_dir: str, clip_model_dir: str,
                       dtype=jnp.float32) -> PromptMiner:
    """Load openai/clip-vit-large-patch14-layout weights + tokenizer files
    and assemble the zero-shot prompt miner."""
    from edgestyle_tpu.core.pretrained import load_clip_model_params
    from edgestyle_tpu.data.tokenizer import CLIPTokenizer
    from edgestyle_tpu.models.clip_text import (
        CLIPTextConfig,
        CLIPTextModelWithProjection,
    )
    from edgestyle_tpu.models.clip_vision import (
        CLIPVisionConfig,
        CLIPVisionModelWithProjection,
    )

    tok = CLIPTokenizer.from_pretrained_dir(tokenizer_dir)
    params = load_clip_model_params(clip_model_dir)
    text_m = CLIPTextModelWithProjection(CLIPTextConfig(), dtype=dtype)
    vis_m = CLIPVisionModelWithProjection(CLIPVisionConfig(), dtype=dtype)
    encode_text = jax.jit(
        lambda ids: text_m.apply({"params": params["text"]}, ids)["text_embeds"]
    )
    encode_image = jax.jit(
        lambda px: vis_m.apply({"params": params["vision"]}, px)["image_embeds"]
    )
    return PromptMiner(tok, BestEmbeddings(tok, encode_image, encode_text))


def clip_similarity(encode_image_fn, imgs_a, imgs_b) -> jax.Array:
    """Cosine similarity between two image batches — the dataset-pair
    filter (reference dataset_local.py:116-162, keep 0.80–0.90)."""
    ea = encode_image_fn(imgs_a)
    eb = encode_image_fn(imgs_b)
    ea = ea / jnp.linalg.norm(ea, axis=-1, keepdims=True)
    eb = eb / jnp.linalg.norm(eb, axis=-1, keepdims=True)
    return jnp.sum(ea * eb, axis=-1)
