"""Per-token argmax + BIO decode + WordPiece merge.

Behavioral port of the entity-reconstruction loop in
/root/reference/src/ner_extension.cpp:119-167. The quirks below are load-
bearing (the reference's tests pin them; SURVEY.md A11-A12):

- label scheme: index 0 = O, odd = B-X, even>0 = I-X; class names via
  ``LABEL_MAP`` (src/ner_extension.cpp:97);
- group id ``(best+1)//2``: B-X and I-X of one class share a group (:141-144);
- continue the current entity iff same group AND (I-tag OR the token is a
  ``##`` subword) (:147) — a B-tag starts a NEW entity even mid-class;
- a bare I-tag after O *starts* an entity (no preceding B required);
- subwords concatenate with no space, full words join with one space (:149);
- the entity's label is the label of its FIRST token (:156);
- [CLS]/[SEP] are skipped without touching the merge state (:133-136);
- a trailing open entity is flushed after the loop (:165-167).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

LABEL_MAP = ("O", "MISC", "MISC", "PER", "PER", "ORG", "ORG", "LOC", "LOC")


def decode_entities(
    token_ids: Sequence[int],
    logits: np.ndarray,
    id_to_token,
) -> list[tuple[str, str]]:
    """(token ids, [n_tokens, n_labels] logits) → [(entity_text, label)]."""
    best = np.asarray(logits).argmax(axis=-1)

    entities: list[tuple[str, str]] = []
    cur_text = ""
    cur_label = ""
    last_group = 0

    for t, tok_id in enumerate(token_ids):
        best_label = int(best[t])
        token_str = id_to_token(tok_id)
        if token_str in ("[CLS]", "[SEP]"):
            continue

        is_subword = len(token_str) > 2 and token_str.startswith("##")
        clean = token_str[2:] if is_subword else token_str

        group = 0 if best_label == 0 else (best_label + 1) // 2

        if group != 0:
            if group == last_group and (best_label % 2 == 0 or is_subword):
                cur_text += ("" if is_subword else " ") + clean
            else:
                if last_group != 0:
                    entities.append((cur_text, cur_label))
                cur_text = clean
                cur_label = LABEL_MAP[best_label]
        else:
            if last_group != 0:
                entities.append((cur_text, cur_label))
        last_group = group

    if last_group != 0:
        entities.append((cur_text, cur_label))
    return entities
