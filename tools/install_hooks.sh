#!/bin/bash
# Install the repo's git hooks (pre-commit smoke gate). Run once per clone.
cd "$(dirname "$0")/.."
cat > .git/hooks/pre-commit <<'EOF'
#!/bin/bash
exec bash tools/smoke.sh
EOF
chmod +x .git/hooks/pre-commit
echo "pre-commit smoke gate installed (tools/smoke.sh)"
