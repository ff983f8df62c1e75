"""RTF to plain text (operator T2 in SURVEY.md §2.4).

From-scratch group/control-word state machine over the public RTF 1.9.1
spec, behavior-matched to the ``striprtf.rtf_to_text`` call the
reference makes (converter.py:97-101, striprtf==0.0.29 defaults:
cp1252, strict errors):

- ``{`` / ``}`` push/pop (ucskip, ignorable) group state;
- ignorable destinations (``\\fonttbl``, ``\\stylesheet``, ``\\info``,
  ``\\pict`` ...) and ``\\*``-prefixed groups contribute no text;
- ``\\par``/``\\line``/``\\tab``/quote dashes etc. map to literal
  characters; ``\\{ \\} \\\\`` escape literally;
- ``\\uN`` emits the Unicode scalar (negative N + 0x10000) and skips
  the next ``\\ucN`` fallback tokens (default 1);
- ``\\'hh`` hex escapes accumulate into byte runs decoded as cp1252
  with strict errors — a decode failure raises, which the caller's
  fallback cascade treats as "RTF parse failed" exactly like the
  reference does;
- raw CR/LF in the token stream is ignored.
"""

from __future__ import annotations

import re

# Ignorable destination control words per the RTF 1.9.1 spec (the
# standard "destination text is not document text" set).
DESTINATIONS = frozenset(
    """aftncn aftnsep aftnsepc annotation atnauthor atndate atnicn atnid
    atnparent atnref atntime atrfend atrfstart author background bkmkend
    bkmkstart blipuid buptim category colorschememapping colortbl comment
    company creatim datafield datastore defchp defpap do doccomm docvar
    dptxbxtext ebcend ebcstart factoidname falt fchars ffdeftext ffentrymcr
    ffexitmcr ffformat ffhelptext ffl ffname ffstattext field file filetbl
    fldinst fldrslt fldtype fname fontemb fontfile fonttbl footer footerf
    footerl footerr footnote formfield ftncn ftnsep ftnsepc g generator
    gridtbl header headerf headerl headerr hl hlfr hlinkbase hlloc hlsrc
    hsv htmltag info keycode keywords latentstyles lchars levelnumbers
    leveltext lfolevel linkval list listlevel listname listoverride
    listoverridetable listpicture liststylename listtable listtext
    lsdlockedexcept macc maccPr mailmerge maln malnScr manager margPr mbar
    mbarPr mbaseJc mbegChr mborderBox mborderBoxPr mbox mboxPr mchr mcount
    mctrlPr md mdeg mdegHide mden mdiff mdPr me mendChr meqArr meqArrPr mf
    mfName mfPr mfunc mfuncPr mgroupChr mgroupChrPr mgrow mhideBot
    mhideLeft mhideRight mhideTop mhtmltag mlim mlimloc mlimlow mlimlowPr
    mlimupp mlimuppPr mm mmaddfieldname mmath mmathPict mmathPr mmaxdist
    mmc mmcJc mmconnectstr mmconnectstrdata mmcPr mmcs mmdatasource
    mmheadersource mmmailsubject mmodso mmodsofilter mmodsofldmpdata
    mmodsomappedname mmodsoname mmodsorecipdata mmodsosort mmodsosrc
    mmodsotable mmodsoudl mmodsoudldata mmodsouniquetag mmPr mmquery mmr
    mnary mnaryPr mnoBreak mnum mobjDist moMath moMathPara moMathParaPr
    mopEmu mphant mphantPr mplcHide mpos mr mrad mradPr mrPr msepChr mshow
    mshp msPre msPrePr msSub msSubPr msSubSup msSubSupPr msSup msSupPr
    mstrikeBLTR mstrikeH mstrikeTLBR mstrikeV msub msubHide msup msupHide
    mtransp mtype mvertJc mvfmf mvfml mvtof mvtol mzeroAsc mzeroDesc
    mzeroWid nesttableprops nextfile nonesttables objalias objclass
    objdata object objname objsect objtime oldcprops oldpprops oldsprops
    oldtprops oleclsid operator panose password passwordhash pgp pgptbl
    picprop pict pn pnseclvl pntext pntxta pntxtb printim private propname
    protend protstart protusertbl pxe result revtbl revtim rsidtbl rxe shp
    shpgrp shpinst shppict shprslt shptxt sn sp staticval stylesheet
    subject sv svb tc template themedata title txe ud upr userprops
    wgrffmtfilter windowcaption writereservation writereservhash xe xform
    xmlattrname xmlattrvalue xmlclose xmlname xmlnstbl xmlopen""".split()
)

# Control words with a literal character expansion.
SPECIAL_WORDS = {
    "par": "\n",
    "sect": "\n\n",
    "page": "\n\n",
    "line": "\n",
    "tab": "\t",
    "emdash": "\u2014",
    "endash": "\u2013",
    "emspace": "\u2003",
    "enspace": "\u2002",
    "qmspace": "\u2005",
    "bullet": "\u2022",
    "lquote": "\u2018",
    "rquote": "\u2019",
    "ldblquote": "\u201c",
    "rdblquote": "\u201d",
    "row": "\n",
    "cell": "|",
    "nestcell": "|",
}

# Escaped single characters: literal braces/backslash plus the
# non-breaking/soft-hyphen escapes.
SPECIAL_CHARS = {
    "\\": "\\",
    "{": "{",
    "}": "}",
    "~": "\u00a0",
    "-": "\u00ad",
    "_": "\u2011",
}

_TOKEN = re.compile(
    r"\\([a-z]{1,32})(-?\d{1,10})?[ ]?"  # control word + optional numeric arg
    r"|\\'([0-9a-f]{2})"  # hex escape
    r"|\\([^a-z])"  # control symbol
    r"|([{}])"  # group delimiters
    r"|[\r\n]+"  # raw newlines: ignored
    r"|(.)",  # document text
    re.DOTALL,  # no IGNORECASE: control words are lowercase per spec;
    # uppercase sequences fall through to the control-symbol branch
)


def rtf_to_text(text: str, encoding: str = "cp1252", errors: str = "strict") -> str:
    """Strip RTF markup, returning document text (see module docstring)."""
    stack: list[tuple[int, bool]] = []
    ucskip = 1  # \ucN fallback-token count
    ignorable = False  # inside an ignorable destination group
    curskip = 0  # pending \uN fallback tokens to skip
    out: list[str] = []
    hex_run = bytearray()

    def flush_hex() -> None:
        if hex_run:
            out.append(hex_run.decode(encoding, errors))
            hex_run.clear()

    for match in _TOKEN.finditer(text):
        word, arg, hexcode, char, brace, tchar = match.groups()
        if brace:
            flush_hex()
            curskip = 0
            if brace == "{":
                stack.append((ucskip, ignorable))
            elif stack:
                ucskip, ignorable = stack.pop()
        elif char is not None:
            flush_hex()
            curskip = 0
            if char in SPECIAL_CHARS:
                if not ignorable:
                    out.append(SPECIAL_CHARS[char])
            elif char == "*":
                ignorable = True
        elif word is not None:
            flush_hex()
            curskip = 0
            if word in DESTINATIONS:
                ignorable = True
            elif ignorable:
                pass
            elif word in SPECIAL_WORDS:
                out.append(SPECIAL_WORDS[word])
            elif word == "uc":
                ucskip = int(arg or 0)
            elif word == "u":
                codepoint = int(arg or 0)
                if codepoint < 0:
                    codepoint += 0x10000
                out.append(chr(codepoint))
                curskip = ucskip
        elif hexcode is not None:
            if curskip > 0:
                curskip -= 1
            elif not ignorable:
                hex_run.append(int(hexcode, 16))
        elif tchar is not None:
            flush_hex()
            if curskip > 0:
                curskip -= 1
            elif not ignorable:
                out.append(tchar)
    flush_hex()
    return "".join(out)
