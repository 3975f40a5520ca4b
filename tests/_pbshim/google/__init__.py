"""Namespace bridge to the gcloud SDK's appengine-bundled ``google``
package so ``google.protobuf`` resolves. The site-packages tree has no
``google`` package at all, so nothing is shadowed; only
``google.protobuf`` is ever imported through this bridge (the bundle's
other subpackages — appengine/auth/oauth2 — stay untouched)."""
import os

_sdk = "/usr/lib/google-cloud-sdk/platform/google_appengine/google"
if os.path.isdir(os.path.join(_sdk, "protobuf")):
    __path__.append(_sdk)
