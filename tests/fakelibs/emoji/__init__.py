"""API-faithful TEST DOUBLE for the ``emoji`` package — NOT the real
library. Implements ``demojize(text, language="en")`` for a handful of
codepoints plus a generic ``:u1fXXX:`` fallback so
``make_demojize_udf``'s worker-side ``import emoji`` path executes."""

_NAMES = {
    "\U0001F600": ":grinning_face:",
    "\U0001F602": ":face_with_tears_of_joy:",
    "\U0001F44D": ":thumbs_up:",
    "❤": ":red_heart:",
}


def demojize(text, language="en", delimiters=(":", ":")):
    if text is None:
        return None
    out = []
    for ch in text:
        if ch in _NAMES:
            name = _NAMES[ch].strip(":")
            out.append(delimiters[0] + name + delimiters[1])
        elif 0x1F300 <= ord(ch) <= 0x1FAFF:
            out.append(f"{delimiters[0]}u{ord(ch):x}{delimiters[1]}")
        else:
            out.append(ch)
    return "".join(out)
